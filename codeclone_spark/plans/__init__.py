"""Engine plans: facts stage, baseline, checkpoint ledger, runner, report."""
