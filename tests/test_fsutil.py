"""fs_write_text's write-once commit contract: atomic publish via
temp+rename, benign-race tolerance, and precise failure reporting."""

import pytest

from outboxx_spark import fsutil
from outboxx_spark.fsutil import fs_exists, fs_read_text, fs_write_text


def test_roundtrip_and_exists(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    assert fs_read_text(spark, p) is None
    assert not fs_exists(spark, p)
    fs_write_text(spark, p, '{"k": 1}')
    assert fs_read_text(spark, p) == '{"k": 1}'
    assert fs_exists(spark, p)
    # no temp residue after a clean publish (dotfiles are Hadoop
    # ChecksumFileSystem .crc sidecars — local-fs-only artifacts)
    assert _visible(tmp_path) == ["meta.json"]


def _visible(d):
    return sorted(f.name for f in d.iterdir() if not f.name.startswith("."))


def test_lost_race_same_payload_is_success(spark, tmp_path):
    # rename onto an existing destination fails on the local fs; when
    # the destination already holds exactly our payload, the other
    # writer won and the write-once contract is satisfied
    p = str(tmp_path / "meta.json")
    fs_write_text(spark, p, "payload")
    fs_write_text(spark, p, "payload")  # no raise
    assert fs_read_text(spark, p) == "payload"


def test_conflicting_destination_reports_differs(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    fs_write_text(spark, p, "theirs")
    with pytest.raises(IOError, match="destination differs"):
        fs_write_text(spark, p, "mine")
    # loser's temp file is cleaned up
    assert _visible(tmp_path) == ["meta.json"]


def test_absent_destination_reports_transient_failure(spark, tmp_path, monkeypatch):
    # a rename that fails with NO destination present is a transient
    # store failure, not a lost race — the message must not claim the
    # destination differs (r6 fix from the r5 advisory)
    p = str(tmp_path / "meta.json")
    fs_write_text(spark, p, "occupant")  # force the rename to fail
    monkeypatch.setattr(fsutil, "fs_read_text", lambda *_a, **_k: None)
    with pytest.raises(IOError, match="destination absent after failed rename"):
        fs_write_text(spark, p, "mine")
