"""Checkpoint registry + md5 verification (ckpt_util parity)."""

import hashlib

import pytest

from tfmq_dm_tpu.pipelines import ckpt_util


def test_md5_of(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"tfmq" * 1000)
    assert ckpt_util.md5_of(str(p)) == hashlib.md5(
        b"tfmq" * 1000).hexdigest()


def test_alias_and_unknown(tmp_path, monkeypatch):
    monkeypatch.delenv("TFMQ_ALLOW_DOWNLOAD", raising=False)
    # church_outdoor alias resolves to lsun_church (ckpt_util.py:59-60)
    with pytest.raises(FileNotFoundError) as e:
        ckpt_util.get_ckpt_path("ema_lsun_church_outdoor",
                                root=str(tmp_path))
    assert "ema_lsun_church" in str(e.value)
    with pytest.raises(KeyError):
        ckpt_util.get_ckpt_path("nope", root=str(tmp_path))


def test_existing_file_verified(tmp_path, monkeypatch):
    monkeypatch.delenv("TFMQ_ALLOW_DOWNLOAD", raising=False)
    rel = ckpt_util.CACHE_PATHS["ema_cifar10"]
    p = tmp_path / rel
    p.parent.mkdir(parents=True)
    p.write_bytes(b"not the real ckpt")
    # without check: accepted as-is
    assert ckpt_util.get_ckpt_path("ema_cifar10",
                                   root=str(tmp_path)) == str(p)
    # with check: md5 mismatch -> treated as missing
    with pytest.raises(FileNotFoundError):
        ckpt_util.get_ckpt_path("ema_cifar10", root=str(tmp_path),
                                check=True)
