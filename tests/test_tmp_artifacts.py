"""tmp_artifacts contract: pid-scoped paths are unique per process and the
exit hook removes exactly what this pid registered (ADVICE r3 leak fix)."""

from __future__ import annotations

import os

from pyspark_ml_features_spark import tmp_artifacts


def test_pid_scoped_path_is_pid_unique_and_registered():
    p = tmp_artifacts.pid_scoped("pmfs_test_artifact")
    assert p.endswith(f"_{os.getpid()}")
    assert p in tmp_artifacts._REGISTERED


def test_cleanup_removes_files_and_dirs(tmp_path):
    f = tmp_path / "file.txt"
    f.write_text("x")
    d = tmp_path / "adir"
    d.mkdir()
    (d / "inner").write_text("y")
    missing = tmp_path / "never_created"
    for p in (f, d, missing):
        tmp_artifacts.register(str(p))
    tmp_artifacts._cleanup()
    assert not f.exists()
    assert not d.exists()  # rmtree'd recursively


def test_cleanup_is_idempotent():
    # second invocation over the same (now mostly removed) set must not raise
    tmp_artifacts._cleanup()
