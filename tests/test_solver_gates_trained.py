"""Fast-solver quality gates on a TRAINED model (r4 task 7).

The heun15/dpm10 gates in test_heun_sampler.py / test_dpm_sampler.py pin
solver fidelity on random-weight models; random score fields can be
unrepresentatively smooth, so the fast-solver claims need the same gates on
a trained score field. This trains the tiny GradTTS from the
convergence-study recipe (tests/test_training_convergence_parity.py — the
same synthetic corpus with learnable token→feature structure) for 300
production train steps, then pins end-to-end solver distances against a
converged Euler@400 solution on the trained weights.

MEASURED (r4) — the random-weight gates do NOT transfer. Rel RMSE vs
Euler@400 on the trained field:

    euler@10 0.3274   euler@50 0.1230   euler@100 0.0569  euler@200 0.0394
    dpm@8    0.3905   dpm@10   0.2498   dpm@15    0.0852  dpm@25    0.0369
    heun@15  0.2022   heun@25  0.1279

dpm@10 beat euler@50 handily on random weights (0.078 vs 0.236) but LOSES
on trained weights (0.2498 vs 0.1230) — trained score fields are stiffer.
The quality-gated fast-solver operating point is therefore **dpm@15**
(0.0852 < 0.1230 at 15/50ths the evals; dpm@25 0.0369 even beats
euler@200's 0.0394). The bench reports dpm15 as the gated fast path and
dpm10 as an ungated speed point.

Reference sampler under test: /root/reference/src/model/diffusion.py:302-324
(50 Euler steps is the reference protocol).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.infer.sampler import synthesize
from arttts_tpu.models.tts import GradTTSModel
from tests.test_training_convergence_parity import (
    _our_config,
    make_corpus,
)

N_TRAIN_STEPS = 300


@pytest.fixture(scope="module")
def trained_small():
    """Tiny GradTTS trained 300 steps on the learnable synthetic corpus via
    the production train step (unpinned randomness — this is a quality
    fixture, not a parity study)."""
    from arttts_tpu.train.step import create_train_state, make_train_step

    model = GradTTSModel(config=_our_config())
    batches = make_corpus()
    key = jax.random.PRNGKey(11)
    b0 = batches[0]
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(b0["x"]), jnp.asarray(b0["x_lengths"]),
        jnp.asarray(b0["y"]), jnp.ones((b0["y"].shape[0], b0["y"].shape[1], 1)),
        jnp.zeros((b0["x"].shape[0],)),
    )
    state = create_train_state(model, variables, learning_rate=1e-3)
    step_fn = make_train_step(model, out_size=32, donate=False)
    first = last = None
    for i in range(N_TRAIN_STEPS):
        b = batches[i % len(batches)]
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jax.random.fold_in(key, i), batch)
        if i == 0:
            first = float(metrics["total_loss"])
        last = float(metrics["total_loss"])
    # the fixture is only meaningful if training actually learned
    assert last < 0.6 * first, (first, last)
    return model, {"params": state.params}, batches


def _synth(model, variables, x, xl, steps, solver):
    _, dec, _, yl = synthesize(
        model, variables, jax.random.PRNGKey(7), x, xl,
        n_timesteps=steps, max_frames=64, solver=solver,
    )
    return np.asarray(dec), np.asarray(yl)


@pytest.mark.slow
def test_solver_gates_on_trained_model(trained_small):
    """The gated fast-solver operating point on trained weights: dpm@15
    within rel RMSE 0.12 of converged Euler@400 AND strictly better than
    the Euler@50 reference protocol at 15/50ths the evals; heun@25 within
    1.15x of Euler@50 (50 evals); dpm@25 matches Euler@200-level
    convergence. Measured values in the module docstring."""
    model, variables, batches = trained_small
    x = jnp.asarray(batches[0]["x"][:2])
    xl = jnp.asarray(batches[0]["x_lengths"][:2])

    ref, yl = _synth(model, variables, x, xl, 400, "euler")
    mask = (
        np.arange(ref.shape[1])[None, :, None] < yl[:, None, None]
    ).astype(np.float32)

    def rel(a):
        d = (a - ref) * mask
        sig = np.sqrt(((ref * mask) ** 2).sum() / mask.sum())
        return float(np.sqrt((d ** 2).sum() / mask.sum()) / sig)

    e_e50 = rel(_synth(model, variables, x, xl, 50, "euler")[0])
    e_dpm15 = rel(_synth(model, variables, x, xl, 15, "dpm")[0])
    e_dpm25 = rel(_synth(model, variables, x, xl, 25, "dpm")[0])
    e_heun25 = rel(_synth(model, variables, x, xl, 25, "heun")[0])
    print(
        f"trained gates: euler50 {e_e50:.4f} dpm15 {e_dpm15:.4f} "
        f"dpm25 {e_dpm25:.4f} heun25 {e_heun25:.4f}"
    )

    assert e_dpm15 <= 0.12, e_dpm15
    assert e_dpm15 < e_e50, (e_dpm15, e_e50)
    assert e_dpm25 <= 0.06, e_dpm25
    assert e_heun25 <= 1.15 * e_e50, (e_heun25, e_e50)
