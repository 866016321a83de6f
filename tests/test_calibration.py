"""End-to-end PTQ calibration tests on the tiny DDIM UNet (CPU).

Exercises: weight qparam init -> asym I/O capture -> TIB + block + layer
reconstruction (small iters) -> FSC -> artifact round-trip -> quantized
sampling with per-step FSC swap. Mirrors the reference flow
cali_model -> load_cali_model -> sample (calibration.py:45-224).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmq_dm_tpu.models import ddim_unet, ddim_units
from tfmq_dm_tpu.quant import recon
from tfmq_dm_tpu.quant.artifact import save_artifact, load_artifact
from tfmq_dm_tpu.quant.calibrate import cali_model
from tfmq_dm_tpu.quant.context import QuantCtx
from tfmq_dm_tpu.quant.fsc import fsc_calibrate
from tfmq_dm_tpu.quant.inference import make_model_fn
from tfmq_dm_tpu.quant.recon import ReconHP, init_weight_qparams
from tfmq_dm_tpu.samplers.ddim import generalized_scan, harvest_trajectory
from tfmq_dm_tpu.utils.schedules import get_beta_schedule, skip_seq

CFG = ddim_unet.tiny_config()
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                          num_diffusion_timesteps=100)
SEQ = skip_seq("uniform", 100, 5)


@pytest.fixture(scope="module")
def setup():
    params = ddim_unet.init_params(jax.random.PRNGKey(0), CFG)
    adapter = ddim_units.build_adapter(CFG, w_bits=8, a_bits=8)

    def fp_fn(x, t, step):
        return ddim_unet.apply(params, CFG, x, t)

    xs, ts = harvest_trajectory(fp_fn, BETAS, SEQ,
                                jax.random.normal(jax.random.PRNGKey(1),
                                                  (8, 16, 16, 3)),
                                jax.random.PRNGKey(2))
    # sample-major w-cali data (flatten groups), group-major a-cali data
    w_cali = (xs.reshape(-1, 16, 16, 3), ts.reshape(-1))
    a_cali = (xs, ts)
    return params, adapter, w_cali, a_cali


def test_unit_specs_cover_policy(setup):
    params, adapter, _, _ = setup
    unit_layers = {full for u in adapter.units for _, full in u.layers}
    for name in adapter.policy.weight_layers():
        pol = adapter.policy.get(name)
        if pol.recon or pol.quant_emb:
            assert name in unit_layers, name
    # tib is first (recon_model hits temb first, calibration.py:70-74)
    assert adapter.units[0].kind == "tib"


def test_capture_asym_differs_from_fp(setup):
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inp_fp, out_fp = recon.capture_unit_io(
        adapter, unit, params, w_cali, wstate, asym=False)
    inp_q, out_q = recon.capture_unit_io(
        adapter, unit, params, w_cali, wstate, asym=True)
    # outputs always FP
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(out_q),
                               atol=1e-6)
    # asym inputs come from the quantized prefix -> differ
    assert float(jnp.abs(inp_q[0] - inp_fp[0]).max()) > 1e-6


def test_unit_fwd_matches_model_block(setup):
    """Role-keyed unit forward must equal the in-model block forward
    given the same inputs and quant state."""
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    inp, out_fp = recon.capture_unit_io(adapter, unit, params, w_cali,
                                        wstate, asym=False)
    # FP unit forward == captured FP output
    rc = adapter.role_cfgs(unit, frozenset())
    fp_rc = tuple(type(r)(role=r.role) for r in rc)
    up = adapter.extract_uparams(params, unit)
    pred = ddim_units.unit_fwd("res", fp_rc, unit.extra, up, {}, {},
                               inp, False, False)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(out_fp),
                               atol=1e-5)


def test_reconstruction_reduces_loss(setup):
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="mse")
    hp = ReconHP(iters=60, batch_size=8, warmup=0.2)
    unit = adapter.unit_by_name("mid.block_1")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, w_cali,
                                            wstate, asym=True)
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(3))
    assert losses is not None
    # rec loss must drop vs the start (soft-rounding init recovers the
    # real-valued weights, then optimization refines)
    assert float(losses[-1]) < float(losses[0]) * 1.5
    # alphas written back for conv1/conv2 but NOT temb_proj (quant_emb)
    assert "alpha" in new_wstate["mid.block_1.conv1"]
    assert "alpha" in new_wstate["mid.block_1.conv2"]
    assert "alpha" not in new_wstate["mid.block_1.temb_proj"]


@pytest.mark.slow
def test_tib_reconstruction(setup):
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="mse")
    hp = ReconHP(iters=40, batch_size=8)
    unit = adapter.units[0]
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, w_cali,
                                            wstate)
    assert isinstance(outputs, tuple)
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(4))
    # every temb_proj trains inside the TIB (reconstruction.py:246-258)
    projs = [f for f in new_wstate if f.endswith("temb_proj")]
    assert projs and all("alpha" in new_wstate[f] for f in projs)
    assert "alpha" in new_wstate["temb.dense.1"]
    # dense.0 is policy-excluded (first layer, quant_model.py:113-116)
    assert "temb.dense.0" not in new_wstate


@pytest.mark.slow
def test_fsc_and_quantized_sampling(setup):
    params, adapter, w_cali, a_cali = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    astate = fsc_calibrate(adapter, params, wstate, a_cali,
                           jax.random.PRNGKey(5), running_stat=True,
                           init_samples=4, batch_size=4)
    sites = list(astate)
    assert sites
    g = a_cali[0].shape[0]
    for st in astate.values():
        assert st["delta"].shape[0] == g
    # softmax site always_zero: zp == 0, delta > 0
    smax = [s for s in sites if s.endswith("aqtizer_w")]
    assert smax
    assert float(jnp.abs(astate[smax[0]]["zp"]).max()) == 0.0
    assert float(astate[smax[0]]["delta"].min()) > 0.0
    # per-group deltas differ (timestep-dependent act ranges)
    some = astate[sites[0]]["delta"]
    assert float(jnp.std(some)) >= 0.0

    model_fn = make_model_fn(adapter, params, wstate, astate,
                             use_wq=True, use_aq=True)
    out = jax.jit(lambda x: generalized_scan(model_fn, BETAS, SEQ, x))(
        jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3)))
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_cali_model_end_to_end_and_artifact_roundtrip(setup):
    params, adapter, w_cali, a_cali = setup
    hp = ReconHP(iters=10, batch_size=4)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cali.npz")
        wstate, astate = cali_model(adapter, params, w_cali, a_cali,
                                    hp=hp, use_aq=True, running_stat=False,
                                    path=path, key=jax.random.PRNGKey(7),
                                    meta={"model": "tiny"})
        w2, a2, meta = load_artifact(path)
        assert meta["model"] == "tiny"
        assert set(w2) == set(wstate)
        for name in wstate:
            for f in wstate[name]:
                np.testing.assert_allclose(np.asarray(wstate[name][f]),
                                           np.asarray(w2[name][f]),
                                           atol=0)
        assert set(a2) == set(astate)
        # loaded state drives quantized sampling
        model_fn = make_model_fn(adapter, params, w2, a2, use_wq=True,
                                 use_aq=True)
        out = generalized_scan(model_fn, BETAS, SEQ,
                               jax.random.normal(jax.random.PRNGKey(8),
                                                 (1, 16, 16, 3)))
        assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_fisher_reconstruction(setup):
    """FISHER_DIAG recon path: grads captured via output-override KL
    (GetLayerGrad semantics) and the weighted loss decreases."""
    params, adapter, w_cali, _ = setup
    wstate = recon.init_weight_qparams(adapter.policy, params,
                                       scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")
    fg = recon.capture_unit_grads(adapter, unit, params, w_cali, wstate,
                                  batch_size=16)
    assert fg.shape == ctx_shape_of(w_cali, unit, adapter, params, wstate)
    assert float(fg.min()) >= 1.0  # |g| + 1
    hp = recon.ReconHP(iters=30, batch_size=8, rloss="fisher_diag")
    inputs, outputs = recon.capture_unit_io(adapter, unit, params, w_cali,
                                            wstate, asym=True)
    new_wstate, losses = recon.reconstruct_unit(
        adapter, unit, params, wstate, inputs, outputs, hp,
        jax.random.PRNGKey(11), fgrads=fg)
    assert "alpha" in new_wstate["mid.block_1.conv1"]
    assert np.all(np.isfinite(np.asarray(losses)))


def ctx_shape_of(w_cali, unit, adapter, params, wstate):
    from tfmq_dm_tpu.quant.context import QuantCtx
    ctx = QuantCtx(adapter.policy, capture=frozenset({unit.name}))
    adapter.forward(params, ctx, *(x[:1] for x in w_cali))
    out = ctx.tape[f"{unit.name}::out"]
    return (w_cali[0].shape[0],) + out.shape[1:]


@pytest.mark.slow
def test_resumable_reconstruction(setup, tmp_path):
    """Per-unit checkpointing: a second run skips completed units and
    reproduces the same wstate (the reference loses everything on crash,
    calibration.py:153-154)."""
    params, adapter, w_cali, _ = setup
    hp = ReconHP(iters=6, batch_size=4)
    wstate0 = init_weight_qparams(adapter.policy, params, scaler="minmax")
    d = str(tmp_path / "resume")
    w1 = recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                           jax.random.PRNGKey(21), resume_dir=d,
                           capture_batch_size=16)
    import os
    assert len(os.listdir(d)) > 0
    # resume from the checkpoints: must skip everything and agree
    w2 = recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                           jax.random.PRNGKey(21), resume_dir=d,
                           capture_batch_size=16)
    a1 = np.asarray(w1["mid.block_1.conv1"]["alpha"])
    a2 = np.asarray(w2["mid.block_1.conv1"]["alpha"])
    np.testing.assert_allclose(a1, a2, atol=1e-7)


@pytest.mark.slow
def test_host_offload_chunked_reconstruction(setup, monkeypatch):
    """Units whose cached I/O exceeds the device budget stream to host
    and run a chunked Adam schedule (the reference's keep_gpu=False,
    calibration.py:62-67); the result must still train (loss decreases)
    and produce alphas for every trained layer."""
    params, adapter, w_cali, _ = setup
    monkeypatch.setattr(recon, "HOST_OFFLOAD_BYTES", 1)       # force
    monkeypatch.setattr(recon, "_HOST_CHUNK_BYTES", 1 << 20)  # tiny chunks
    hp = ReconHP(iters=40, batch_size=4)
    wstate0 = init_weight_qparams(adapter.policy, params, scaler="minmax")
    traces = {}
    w = recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                          jax.random.PRNGKey(5), capture_batch_size=16,
                          log=lambda u, ls: traces.update({u: ls}))
    assert any("alpha" in st for st in w.values())
    ls = np.asarray(traces["mid.block_1"])
    assert ls.shape[0] == 40          # full schedule across chunks
    assert np.isfinite(ls).all()
    assert ls[-5:].mean() < ls[:5].mean()


@pytest.mark.slow
def test_act_phase_reconstruction(setup):
    """The act phase (reconstruction.py:43-48): Adam on act deltas with
    cosine-annealed lr_delta, round-loss NONE. Deltas move, zps and
    weight state stay fixed, and the unit's reconstruction error does
    not get worse."""
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    unit = adapter.unit_by_name("mid.block_1")

    # seed act params from one batch (the lazy init forward)
    ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True,
                   use_aq=True, act_mode="init")
    adapter.forward(params, ctx, *(x[:8] for x in w_cali))
    astate = dict(ctx.out_astate)

    inputs, outputs = recon.capture_unit_io(
        adapter, unit, params, w_cali, wstate, astate,
        asym=True, use_aq=True)
    hp = ReconHP(iters=40, batch_size=8)
    new_astate, losses = recon.reconstruct_unit_act(
        adapter, unit, params, wstate, astate, inputs, outputs, hp,
        jax.random.PRNGKey(5))
    assert losses is not None and np.all(np.isfinite(np.asarray(losses)))
    moved = False
    for site, st in new_astate.items():
        np.testing.assert_array_equal(np.asarray(st["zp"]),
                                      np.asarray(astate[site]["zp"]))
        if not np.array_equal(np.asarray(st["delta"]),
                              np.asarray(astate[site]["delta"])):
            moved = True
    assert moved, "no act delta was updated"
    # loss trend: end of schedule no worse than the start
    ls = np.asarray(losses)
    assert ls[-5:].mean() <= ls[:5].mean() * 1.05


@pytest.mark.slow
def test_reconstruct_act_driver(setup):
    """Sequential act-phase pass over all units runs and returns a flat
    astate with every original site present."""
    params, adapter, w_cali, _ = setup
    wstate = init_weight_qparams(adapter.policy, params, scaler="minmax")
    ctx = QuantCtx(adapter.policy, wstate=wstate, use_wq=True,
                   use_aq=True, act_mode="init")
    adapter.forward(params, ctx, *(x[:8] for x in w_cali))
    astate = dict(ctx.out_astate)
    hp = ReconHP(iters=4, batch_size=8)
    out = recon.reconstruct_act(adapter, params,
                                tuple(x[:8] for x in w_cali),
                                wstate, astate, hp, jax.random.PRNGKey(6))
    assert set(out) == set(astate)


@pytest.mark.slow
def test_midunit_crash_resume(setup, tmp_path, monkeypatch):
    """Segmented mid-unit checkpointing: a crash between segments
    resumes from the ``.partial`` state and produces alphas identical
    to an uninterrupted run (quant/recon.py RESUME_SEG_ITERS — on the
    shared tunnel TPU the big decoder units cannot finish their full
    schedule in one crash-free window, so per-unit resume alone is not
    enough)."""
    params, adapter, w_cali, _ = setup
    monkeypatch.setattr(recon, "RESUME_SEG_ITERS", 4)
    hp = ReconHP(iters=12, batch_size=4)
    wstate0 = init_weight_qparams(adapter.policy, params, scaler="minmax")

    d1 = str(tmp_path / "ok")
    w_ok = recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                             jax.random.PRNGKey(33), resume_dir=d1,
                             capture_batch_size=16)

    # crash after the 5th partial save: mid-way through the 2nd unit
    d2 = str(tmp_path / "crashy")
    saves = {"n": 0}
    orig = recon._save_partial

    def bomb(path, *a, **k):
        orig(path, *a, **k)
        saves["n"] += 1
        if saves["n"] == 5:
            raise RuntimeError("simulated TPU worker crash")

    monkeypatch.setattr(recon, "_save_partial", bomb)
    with pytest.raises(RuntimeError, match="simulated"):
        recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                          jax.random.PRNGKey(33), resume_dir=d2,
                          capture_batch_size=16)
    monkeypatch.setattr(recon, "_save_partial", orig)
    assert any(f.endswith(".partial") for f in os.listdir(d2))

    w_res = recon.reconstruct(adapter, params, w_cali, dict(wstate0), hp,
                              jax.random.PRNGKey(33), resume_dir=d2,
                              capture_batch_size=16)
    # finished units drop their .partial files
    assert not any(f.endswith(".partial") for f in os.listdir(d2))
    for name, st in w_ok.items():
        if "alpha" in st:
            np.testing.assert_allclose(np.asarray(st["alpha"]),
                                       np.asarray(w_res[name]["alpha"]),
                                       atol=1e-7, err_msg=name)
