"""pack_fsc/unpack_fsc: the single-row FSC swap must be bit-exact with
the per-leaf slice_fsc it replaces (quant/fsc.py pack_fsc docstring) —
for every group, every site, including int-typed zero points."""

import jax
import jax.numpy as jnp
import numpy as np

from tfmq_dm_tpu.models import ddim_unet, ddim_units
from tfmq_dm_tpu.quant.context import QuantCtx
from tfmq_dm_tpu.quant.fsc import (_fsc_init, pack_fsc, slice_fsc,
                                   unpack_fsc)
from tfmq_dm_tpu.quant.recon import init_weight_qparams


def test_pack_unpack_bit_exact_vs_slice():
    cfg = ddim_unet.tiny_config()
    params = ddim_unet.init_params(jax.random.PRNGKey(0), cfg)
    adapter = ddim_units.build_adapter(cfg, w_bits=8, a_bits=8)
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    groups = []
    for g in range(3):
        t = jnp.full((4,), 10 + 40 * g, jnp.int32)
        astate, _ = _fsc_init(adapter, "minmax", params, wstate, (x, t))
        groups.append(astate)
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *groups)

    flat, spec = pack_fsc(batched)
    assert flat.shape[0] == 3
    for g in range(3):
        ref = slice_fsc(batched, g)
        got = unpack_fsc(flat[g], spec)
        assert jax.tree_util.tree_structure(ref) == \
            jax.tree_util.tree_structure(got)
        key = lambda kv: jax.tree_util.keystr(kv[0])
        for (kr, vr), (kg, vg) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(ref), key=key),
                sorted(jax.tree_util.tree_leaves_with_path(got), key=key)):
            assert jax.tree_util.keystr(kr) == jax.tree_util.keystr(kg)
            assert vr.dtype == vg.dtype, kr
            np.testing.assert_array_equal(np.asarray(vr),
                                          np.asarray(vg), err_msg=str(kr))


def test_pack_unpack_traced_index():
    """unpack under jit with a traced group index (how the sampler scan
    uses it)."""
    batched = {
        "a": {"delta": jnp.arange(6, dtype=jnp.float32).reshape(3, 2),
              "zp": jnp.arange(3, dtype=jnp.int32)[:, None] * 2},
        "b": {"delta": jnp.ones((3,), jnp.float32) * 0.5,
              "zp": jnp.zeros((3,), jnp.float32)},
    }
    flat, spec = pack_fsc(batched)

    @jax.jit
    def at(g):
        return unpack_fsc(flat[g], spec)

    for g in range(3):
        ref = slice_fsc(batched, g)
        got = at(g)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), ref, got)
        assert got["a"]["zp"].dtype == jnp.int32
