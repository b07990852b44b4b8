"""index_cache_dir trust boundary (ADVICE r8): artifacts under this dir
FEED QUERY OUTPUTS (classifier weights, BPE merges, IVF-PQ codebooks,
semantic stores), so the dir must be provably ours — a pre-created dir
owned by someone else, or a planted symlink/file, must raise instead of
silently serving substituted results. No Spark session needed."""

from __future__ import annotations

import os

import pytest

from c_tran_data_pipeline_spark.session import index_cache_dir


@pytest.fixture()
def override_env(tmp_path, monkeypatch):
    def set_to(p: str) -> None:
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", p)

    return set_to


def test_creates_0700_and_is_idempotent(tmp_path, override_env):
    target = str(tmp_path / "idx")
    override_env(target)
    p = index_cache_dir()
    assert p == target
    assert (os.stat(p).st_mode & 0o777) == 0o700
    assert index_cache_dir() == target  # reuse of our own dir is fine


def test_lax_mode_reasserted_on_reuse(tmp_path, override_env):
    target = tmp_path / "idx"
    target.mkdir(mode=0o777)
    os.chmod(target, 0o777)  # mkdir mode is umask-filtered; force lax
    override_env(str(target))
    index_cache_dir()
    assert (os.stat(target).st_mode & 0o777) == 0o700


def test_planted_symlink_refused(tmp_path, override_env):
    real = tmp_path / "elsewhere"
    real.mkdir()
    link = tmp_path / "idx"
    link.symlink_to(real)
    override_env(str(link))
    with pytest.raises(RuntimeError, match="not a directory"):
        index_cache_dir()


def test_foreign_owner_refused(tmp_path, override_env, monkeypatch):
    target = tmp_path / "idx"
    target.mkdir(mode=0o700)
    override_env(str(target))
    # Simulate another user owning the pre-created dir: lstat is real, so
    # fake OUR uid instead of chown (which needs root).
    real_getuid = os.getuid
    monkeypatch.setattr(os, "getuid", lambda: real_getuid() + 1)
    with pytest.raises(RuntimeError, match="owned by uid"):
        index_cache_dir()
