"""Path allowlist guard (pure driver-side, no Spark)."""

import pytest

from codeclone_spark.sources.readers import validate_data_dir


def test_sensitive_paths_blocked():
    for bad in ("/etc", "/etc/passwd", "/proc/self", "/sys", "/dev/null",
                "/dev", "/root/.ssh"):
        with pytest.raises(ValueError, match="sensitive"):
            validate_data_dir(bad)


def test_dev_shm_carveout_allowed():
    assert validate_data_dir("/dev/shm/some_corpus") == "/dev/shm/some_corpus"


def test_normal_paths_allowed(tmp_path):
    assert validate_data_dir(str(tmp_path)) == str(tmp_path)


def test_escape_via_dotdot_blocked(tmp_path):
    with pytest.raises(ValueError, match="sensitive"):
        validate_data_dir(str(tmp_path) + "/../" * 12 + "etc")


def test_allowed_roots_enforced(tmp_path):
    with pytest.raises(ValueError, match="allowed roots"):
        validate_data_dir(str(tmp_path), allowed_roots=["/somewhere/else"])
