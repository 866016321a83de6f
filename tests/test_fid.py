"""FID harness tests: extractor mechanics, converter exactness (BN fold
+ layout transpose round-trip through a synthetic torch state dict), and
the Frechet math. Real-FID numbers need the standard weights file
(zero-egress here) — see utils/fid.py docstring.

Every test feeds the extractor the SAME input shape (batch 2, 24x24x3 —
inception_pool3 resizes to 299 internally, so the input shape only keys
the jit cache): the InceptionV3 graph compiles once for the whole file
instead of once per test (~4 min -> ~1 min on CPU CI).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfmq_dm_tpu.utils import fid as F
from tfmq_dm_tpu.utils.metrics import activation_stats, fid_from_stats

BATCH, RES = 2, 24


@pytest.fixture(scope="module")
def inception():
    return F.init_inception_params(jax.random.PRNGKey(0))


def test_pool3_shape_and_finite(inception):
    x = np.random.RandomState(0).rand(BATCH, RES, RES, 3).astype(np.float32)
    feats = np.asarray(F.inception_pool3(inception, jnp.asarray(x)))
    assert feats.shape == (BATCH, 2048)
    assert np.isfinite(feats).all()


def test_fid_identity_zero_and_positive(inception):
    ext = F.make_extractor(inception)
    rng = np.random.RandomState(1)
    x = rng.rand(4, RES, RES, 3).astype(np.float32)
    mu1, s1 = activation_stats(x, ext, BATCH)
    assert abs(fid_from_stats(mu1, s1, mu1, s1)) < 1e-6
    y = np.clip(x + 0.1 * rng.rand(*x.shape).astype(np.float32), 0, 1)
    mu2, s2 = activation_stats(y, ext, BATCH)
    assert fid_from_stats(mu1, s1, mu2, s2) > 0


def test_converter_bn_fold_roundtrip(tmp_path):
    """A synthetic torch state dict with torchvision names + BN stats
    converts to params whose forward equals the manual BN fold."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    sd = {}
    manual = {}
    for name, cin, cout, (kh, kw), _, _ in F.CONV_DEFS:
        w = rng.randn(cout, cin, kh, kw).astype(np.float32) \
            / np.sqrt(cin * kh * kw)
        gamma = rng.rand(cout).astype(np.float32) + 0.5
        beta = rng.randn(cout).astype(np.float32) * 0.1
        mean = rng.randn(cout).astype(np.float32) * 0.1
        var = rng.rand(cout).astype(np.float32) + 0.5
        sd[f"{name}.conv.weight"] = torch.from_numpy(w)
        sd[f"{name}.bn.weight"] = torch.from_numpy(gamma)
        sd[f"{name}.bn.bias"] = torch.from_numpy(beta)
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(mean)
        sd[f"{name}.bn.running_var"] = torch.from_numpy(var)
        scale = gamma / np.sqrt(var + F.BN_EPS)
        manual[name] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale),
        }
    path = str(tmp_path / "incep.pth")
    torch.save(sd, path)
    loaded = F.load_inception_params(path)
    x = jnp.asarray(rng.rand(BATCH, RES, RES, 3).astype(np.float32))
    out_l = np.asarray(F.inception_pool3(loaded, x))
    out_m = np.asarray(F.inception_pool3(manual, x))
    np.testing.assert_allclose(out_l, out_m, atol=1e-6)


def test_missing_weights_raises():
    with pytest.raises(FileNotFoundError):
        F.load_inception_params("/nonexistent/weights.pth")


def test_fid_from_npz_protocol(tmp_path, monkeypatch, inception):
    """npz protocol: uint8 NCHW and float NHWC dumps both work."""
    monkeypatch.setattr(F, "load_inception_params",
                        lambda p=None: inception)
    rng = np.random.RandomState(0)
    a = (rng.rand(4, 3, RES, RES) * 255).astype(np.uint8)   # NCHW uint8
    b = rng.rand(4, RES, RES, 3).astype(np.float32)         # NHWC float
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(pa, a)
    np.savez(pb, b)
    val = F.fid_from_npz(pa, pb, batch_size=BATCH)
    assert np.isfinite(val) and val >= 0
