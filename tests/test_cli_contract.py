"""Contract snapshot of the CLI surface — the reference freezes its CLI
help text as a contract file (tests/fixtures/contract_snapshots/
cli_help.txt, SURVEY §5): any flag rename/removal must show up as an
explicit golden diff, not a silent break for spark-submit wrappers.
"""

from __future__ import annotations

import os

from codeclone_spark.cli import build_parser

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cli_help.txt")


def _render_help() -> str:
    os.environ["COLUMNS"] = "100"  # argparse wraps to terminal width
    parser = build_parser()
    chunks = [parser.format_help()]
    subactions = next(
        a for a in parser._actions if hasattr(a, "choices") and a.choices
    )
    for name, sub in sorted(subactions.choices.items()):
        chunks.append(f"\n===== {name} =====\n{sub.format_help()}")
    return "".join(chunks)


def test_cli_help_contract():
    rendered = _render_help()
    if not os.path.exists(GOLDEN):  # first run: write the contract
        with open(GOLDEN, "w") as f:
            f.write(rendered)
    with open(GOLDEN) as f:
        assert rendered == f.read(), (
            "CLI surface changed — if intentional, delete "
            "tests/golden/cli_help.txt and re-run to re-freeze the contract"
        )
