"""dmt-fetch-assets: explicit-egress asset bootstrap (VERDICT r3 missing
#3). The reference downloads implicitly (scoring/fid.py:268-283,
dataset.py:26-35); this build requires --allow_network and verifies
digests before installing."""

import hashlib
import os

import pytest

from disentangle_mlp_tpu.cli import fetch_assets as fa


def test_offline_mode_prints_plan_and_exits_nonzero(tmp_path, capsys,
                                                    monkeypatch):
    # WEIGHT_SEARCH_PATHS snapshots the env at import — patch the lookup,
    # or this test passes vacuously on hosts that have real weights
    from disentangle_mlp_tpu.eval import inception

    monkeypatch.setattr(inception, "find_fid_weights", lambda: None)
    with pytest.raises(SystemExit) as e:
        fa.main(["--dest", str(tmp_path), "--mnist"])
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "--allow_network" in out
    assert "pt_inception-2015-12-05-6726825d.pth" in out
    assert "t10k-images-idx3-ubyte.gz" in out
    assert "CelebA" in out  # consent-gated: never auto-fetched
    assert not list(tmp_path.glob("*.pth"))  # nothing touched the disk


def test_download_verifies_digest(tmp_path, monkeypatch):
    payload_ok = b"fake weights"
    prefix = hashlib.sha256(payload_ok).hexdigest()[:8]

    def fake_retrieve(url, tmp):
        with open(tmp, "wb") as f:
            f.write(payload_ok)

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    dest = str(tmp_path / "w.pth")
    fa._download("http://example.invalid/w.pth", dest, prefix)
    assert os.path.exists(dest)

    # wrong digest: refuse + leave no file behind
    bad_dest = str(tmp_path / "bad.pth")
    with pytest.raises(RuntimeError, match="digest mismatch"):
        fa._download("http://example.invalid/bad.pth", bad_dest, "00000000")
    assert not os.path.exists(bad_dest)
    assert not list(tmp_path.glob("tmp*"))  # temp cleaned up


def test_already_present_fetches_nothing(tmp_path, capsys, monkeypatch):
    w = tmp_path / "pt_inception-2015-12-05-6726825d.pth"
    w.write_bytes(b"x")
    # WEIGHT_SEARCH_PATHS snapshots the env at import; patch the lookup
    from disentangle_mlp_tpu.eval import inception

    monkeypatch.setattr(inception, "find_fid_weights", lambda: str(w))
    fa.main(["--dest", str(tmp_path)])
    out = capsys.readouterr().out
    assert "already present" in out and "nothing to fetch" in out


def _write_gz_labels(path, n):
    import gzip
    import struct

    import numpy as np

    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", n))
        f.write(np.zeros(n, np.uint8).tobytes())


def test_download_keeps_gz_suffix_through_verification(tmp_path, monkeypatch):
    """Regression (review r4): the temp file _verify_idx runs on must keep
    the destination's .gz suffix — _read_idx dispatches gzip.open on the
    suffix, so a suffixless temp rejected every valid gzipped download."""
    def fake_retrieve(url, tmp):
        _write_gz_labels(tmp, 10000)

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    dest = str(tmp_path / "t10k-labels-idx1-ubyte.gz")
    fa._download("http://example.invalid/t10k-labels-idx1-ubyte.gz", dest,
                 verify=lambda p: fa._verify_idx(p, (10000,)))
    assert os.path.exists(dest)


def test_partial_mnist_install_replans_only_missing(tmp_path, capsys,
                                                    monkeypatch):
    """Regression (review r4): with only the train pair installed, a rerun
    must plan the t10k pair instead of reporting the set complete."""
    from disentangle_mlp_tpu.eval import inception

    monkeypatch.setattr(inception, "find_fid_weights", lambda: "present")
    mdest = tmp_path / "mnist"
    mdest.mkdir()
    (mdest / "train-images-idx3-ubyte.gz").write_bytes(b"x")
    (mdest / "train-labels-idx1-ubyte.gz").write_bytes(b"x")
    with pytest.raises(SystemExit):  # offline mode prints the plan
        fa.main(["--dest", str(tmp_path), "--mnist",
                 "--mnist_dest", str(mdest)])
    out = capsys.readouterr().out
    assert "t10k-images-idx3-ubyte.gz" in out
    assert "t10k-labels-idx1-ubyte.gz" in out
    assert "train-images-idx3-ubyte.gz" not in out

    missing = fa._mnist_missing(str(mdest))
    assert [m["file"] for m in missing] == [
        "t10k-images-idx3-ubyte.gz", "t10k-labels-idx1-ubyte.gz"]


def test_verify_idx_structural_check(tmp_path):
    """MNIST downloads are format-verified: the canonical shape passes, a
    truncated/wrong file refuses to install."""
    import gzip
    import struct

    import numpy as np

    def write_labels(path, n):
        with gzip.open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 0x08, 1))
            f.write(struct.pack(">I", n))
            f.write(np.zeros(n, np.uint8).tobytes())

    good = str(tmp_path / "t10k-labels-idx1-ubyte.gz")
    write_labels(good, 10000)
    fa._verify_idx(good, (10000,))  # canonical shape: ok

    bad = str(tmp_path / "truncated.gz")
    write_labels(bad, 9999)
    with pytest.raises(RuntimeError, match="idx shape"):
        fa._verify_idx(bad, (10000,))

    notidx = str(tmp_path / "notidx.gz")
    import gzip as g
    with g.open(notidx, "wb") as f:
        f.write(b"junkjunkjunk")
    with pytest.raises(ValueError):
        fa._verify_idx(notidx, (10000,))
