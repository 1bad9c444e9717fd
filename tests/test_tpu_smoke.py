"""Env-gated REAL-TPU smoke (VERDICT r3 item 5) — the post-outage health
check, replacing ad-hoc `jax.devices()` probes:

    MMC_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

Everything else in tests/ forces the 8-virtual-CPU platform
(tests/conftest.py), so the axon-runtime behaviors the repo documents
(relay RTT, first-exec cost, remote compiles) were guarded only by bench.py
and hand-run probes between rounds. This one file exercises the two load-
bearing runtime paths on the real chip: a scan-epoch train step (the
production dispatch shape) and a fused Pallas kernel vs its XLA twin.

Models are kept tiny so each remote compile stays ~tens of seconds; run
with generous timeouts and NEVER kill it mid-compile (CLAUDE.md).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MMC_TPU_SMOKE"),
    reason="real-TPU smoke; opt in with MMC_TPU_SMOKE=1",
)


@pytest.fixture(scope="module")
def tpu_device():
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        pytest.fail(
            "MMC_TPU_SMOKE=1 but jax resolved to CPU — the smoke would "
            "validate nothing. Run under the axon sitecustomize "
            "(PYTHONPATH=/root/.axon_site) or with JAX_PLATFORMS unset."
        )
    return dev


def test_scan_epoch_trains_finite(tpu_device):
    """One tiny scan-over-batches train epoch on the real chip: the loss
    stream must be finite and the state must advance."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.train import Trainer, make_optimizer

    rs = np.random.RandomState(0)
    frames = jnp.asarray((rs.randn(2000, 96) * 300.0).astype(np.float32))
    dim_used = np.arange(6, 72)
    model = ConvMixer(
        num_blocks=2, dimPosIn=66, dimPosEmb=16, dimPosOut=66, in_nTP=10,
        out_nTP=10, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=4,
        use_max_pooling=False, encoder_n_harmonic_functions=0,
        encoder_omega0=0.1,
    )
    tr = Trainer(model, make_optimizer(lr=1e-3, steps_per_epoch=10),
                 loss_type="mpjpe", dim_used=dim_used, input_n=10,
                 output_n=10, input_scale=1e-3)
    state = tr.init_state(jax.random.PRNGKey(0))
    n_windows = frames.shape[0] - 20
    starts = jnp.asarray(rs.randint(0, n_windows, (8, 32)).astype(np.int32))
    w = jnp.ones((8, 32), jnp.float32)
    epoch_fn = jax.jit(tr._train_epoch_scan_impl)
    # the scan-epoch impl returns (state, weighted-mean epoch loss) —
    # a SCALAR (loop.py _train_epoch_scan_impl), not a per-batch stream
    new_state, loss = epoch_fn(state, frames, starts, w)
    loss = np.asarray(jax.device_get(loss))
    assert loss.shape == ()
    assert np.isfinite(loss) and float(loss) > 0
    assert int(jax.device_get(new_state.step)) == int(
        jax.device_get(state.step)) + 8


def test_fused_kernel_matches_xla(tpu_device):
    """The fused single-channel ConvMixer serving kernel must agree with
    the plain XLA forward on-chip (Mosaic lowering, not interpret mode)."""
    import jax
    import jax.numpy as jnp

    from motionmixerconv_tpu.models import ConvMixer
    from motionmixerconv_tpu.ops.pallas_conv_mixer import make_fused_conv_mixer

    rs = np.random.RandomState(1)
    model = ConvMixer(
        num_blocks=2, dimPosIn=66, dimPosEmb=32, dimPosOut=66, in_nTP=10,
        out_nTP=10, conv_nChan=1, conv1_kernel_shape=(1, 3),
        conv1_stride=(1, 1), conv1_padding=(0, 1), mode_conv="twice",
        activation="mish", regularization=0.1, use_se=True, r_se=4,
        use_max_pooling=False, encoder_n_harmonic_functions=8,
        encoder_omega0=0.1,
    )
    x = jnp.asarray(rs.randn(8, 10, 66).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    plain = jax.jit(lambda v, a: model.apply(v, a, training=False))
    fused = make_fused_conv_mixer(model, variables)
    y_plain = np.asarray(jax.device_get(plain(variables, x)))
    y_fused = np.asarray(jax.device_get(fused(x)))
    assert np.all(np.isfinite(y_plain)) and np.all(np.isfinite(y_fused))
    # Tolerance is set by MXU numerics, not kernel quality: DEFAULT-precision
    # f32 dots on this chip are a SINGLE bf16 pass (measured max rel err
    # 2.3e-3 vs f64 at K=1056; HIGHEST gives 1.4e-7), and the fused kernel
    # and the XLA forward tile their dots differently, so outputs diverge by
    # up to ~bf16-eps per block on O(1) values (observed max 9.2e-3 after 2
    # blocks). 1e-4 agreement is physically impossible here; 3e-2 still
    # catches wrong-weights / structural breaks (those are O(1)).
    np.testing.assert_allclose(y_fused, y_plain, rtol=3e-2, atol=3e-2)
