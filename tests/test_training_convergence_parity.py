"""Trained-quality parity anchor: tiny-corpus convergence study vs the
reference torch trainer.

The strongest available form of "training in this framework converges like
the reference" (SURVEY.md §7 randomness parity; ref loop
`/root/reference/src/train.py:72-333`):

  * identical initial weights — the reference model's random init converted
    through `convert_grad_tts`;
  * identical data — a deterministic synthetic corpus with learnable
    token→feature structure, identical batch order;
  * identical per-step randomness — the three stochastic draws per step
    (diffusion time t, diffusion noise z, segment offsets) come from ONE
    shared numpy generator, pinned into the reference via monkeypatched
    `torch.rand`/`torch.randn`/`random.choice` (tts.py:226-235,
    diffusion.py:316-328) and into our jitted production train step via the
    batch's `pinned_*` fields;
  * matched optimizer — Adam(1e-3) + per-submodule max-norm-1 clipping on
    both sides (train.py:163,176-181 vs `train/step.py:make_optimizer`);
  * dropout zeroed on both sides (torch/jax dropout masks can't be matched).

Under those conditions the two loss trajectories must track step for step
(float-level divergence compounds slowly through Adam), both must actually
learn, and the final weights must agree tree-wise.
"""

import random as _pyrandom
import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

# tiny-but-real hyperparameters (GradTTS family, 2D U-Net decoder)
N_VOCAB = 40
ENC_CH, FILT, FILT_DP = 48, 96, 64
N_HEADS, N_LAYERS, KERNEL, WINDOW = 1, 2, 3, 2
N_FEATS, DEC_DIM = 16, 16
BETA_MIN, BETA_MAX, PE_SCALE = 0.05, 20.0, 1000
LR = 1e-3
OUT_SIZE = 32
B, T_X, T_Y = 4, 12, 48
N_STEPS = 60


def _zero_dropout(torch, module):
    for m in module.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


@pytest.fixture(scope="module")
def ref_small(rng_seed=0):
    torch = pytest.importorskip("torch")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    if "model.monotonic_align" not in sys.modules:
        stub = types.ModuleType("model.monotonic_align")

        def maximum_path(value, mask):
            from arttts_tpu.ops.mas import mas_reference_numpy

            v = (value * mask).detach().cpu().numpy().astype(np.float32)
            m = mask.detach().cpu().numpy()
            t_xs = m.sum(1)[:, 0].astype(np.int32)
            t_ys = m.sum(2)[:, 0].astype(np.int32)
            path = mas_reference_numpy(v, t_xs, t_ys)
            return torch.from_numpy(path).to(dtype=value.dtype)

        stub.maximum_path = maximum_path
        sys.modules["model.monotonic_align"] = stub
    from model.tts import GradTTS

    torch.manual_seed(7)
    m = GradTTS(
        N_VOCAB, 1, None, ENC_CH, FILT, FILT_DP,
        N_HEADS, N_LAYERS, KERNEL, 0.0, WINDOW,
        N_FEATS, DEC_DIM, BETA_MIN, BETA_MAX, PE_SCALE,
    )
    _zero_dropout(torch, m)
    m.train()
    return torch, m


def _our_config():
    from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig

    return ModelConfig(
        name="grad_tts",
        n_feats=N_FEATS,
        n_spks=1,
        encoder=EncoderConfig(
            kind="text", n_vocab=N_VOCAB, n_channels=ENC_CH,
            filter_channels=FILT, filter_channels_dp=FILT_DP,
            n_heads=N_HEADS, n_layers=N_LAYERS, kernel_size=KERNEL,
            dropout=0.0, window_size=WINDOW, prenet_dropout=0.0,
        ),
        decoder=DecoderConfig(kind="unet2d", dim=DEC_DIM),
    )


def make_corpus(seed=123):
    """Deterministic synthetic corpus with learnable structure: each token
    maps to a fixed 16-dim target vector, repeated 4 frames per token, plus
    small iid noise. Losses (dur: constant-durations; prior/diff: the
    token→vector map) are genuinely learnable."""
    g = np.random.default_rng(seed)
    tok_emb = (g.standard_normal((N_VOCAB, N_FEATS)) * 0.7).astype(np.float32)
    N = 2 * B
    x = g.integers(1, N_VOCAB, size=(N, T_X)).astype(np.int64)
    x_lengths = np.array([12, 10, 11, 12, 9, 12, 10, 11], dtype=np.int64)
    y = np.zeros((N, T_Y, N_FEATS), np.float32)
    y_lengths = 4 * x_lengths
    for i in range(N):
        x[i, x_lengths[i]:] = 0
        reps = np.repeat(x[i, : x_lengths[i]], 4)
        y[i, : y_lengths[i]] = tok_emb[reps] + 0.05 * g.standard_normal(
            (y_lengths[i], N_FEATS)
        ).astype(np.float32)
    batches = [
        dict(
            x=x[k * B:(k + 1) * B],
            x_lengths=x_lengths[k * B:(k + 1) * B],
            y=y[k * B:(k + 1) * B],
            y_lengths=y_lengths[k * B:(k + 1) * B],
        )
        for k in range(2)
    ]
    return batches


def draw_step_noise(g, y_lengths):
    """One shared draw per training step: (t, z_torch_layout, offsets)."""
    t = (0.05 + 0.9 * g.random(B)).astype(np.float32)
    z = g.standard_normal((B, N_FEATS, OUT_SIZE)).astype(np.float32)
    max_off = np.maximum(y_lengths - OUT_SIZE, 1)
    off = (g.random(B) * max_off).astype(np.int64)  # in [0, max_off)
    return t, z, off


def train_reference(torch, model, batches, n_steps=N_STEPS, seed=999):
    """The reference training recipe (train.py:163-199) with pinned draws."""
    g = np.random.default_rng(seed)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    hist = []
    orig_rand, orig_randn, orig_choice = torch.rand, torch.randn, _pyrandom.choice
    try:
        for step in range(n_steps):
            b = batches[step % len(batches)]
            t_pin, z_pin, off_pin = draw_step_noise(g, b["y_lengths"])
            off_iter = iter(off_pin.tolist())
            torch.rand = lambda *a, **k: torch.from_numpy(t_pin.copy())
            torch.randn = lambda *a, **k: torch.from_numpy(z_pin.copy())
            _pyrandom.choice = lambda seq: seq[0] + next(off_iter)
            model.zero_grad()
            dur, prior, diff = model.compute_loss(
                torch.from_numpy(b["x"]),
                torch.from_numpy(b["x_lengths"]),
                torch.from_numpy(np.transpose(b["y"], (0, 2, 1)).copy()),
                torch.from_numpy(b["y_lengths"]),
                out_size=OUT_SIZE,
            )
            loss = dur + prior + diff
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.encoder.parameters(), max_norm=1)
            torch.nn.utils.clip_grad_norm_(model.decoder.parameters(), max_norm=1)
            opt.step()
            hist.append(
                (
                    float(dur.detach()),
                    float(prior.detach()),
                    float(diff.detach()),
                )
            )
    finally:
        torch.rand, torch.randn, _pyrandom.choice = orig_rand, orig_randn, orig_choice
    return np.asarray(hist)


def train_ours(params0, batches, n_steps=N_STEPS, seed=999):
    """Same recipe through the production jitted train step + optimizer."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.step import create_train_state, make_train_step

    g = np.random.default_rng(seed)
    model = GradTTSModel(config=_our_config())
    state = create_train_state(model, {"params": params0}, learning_rate=LR)
    step_fn = make_train_step(model, out_size=OUT_SIZE, donate=False)
    key = jax.random.PRNGKey(0)
    hist = []
    for step in range(n_steps):
        b = batches[step % len(batches)]
        t_pin, z_pin, off_pin = draw_step_noise(g, b["y_lengths"])
        batch = dict(
            x=jnp.asarray(b["x"]),
            x_lengths=jnp.asarray(b["x_lengths"]),
            y=jnp.asarray(b["y"]),
            y_lengths=jnp.asarray(b["y_lengths"]),
            pinned_t=jnp.asarray(t_pin),
            pinned_z=jnp.asarray(np.transpose(z_pin, (0, 2, 1)).copy()),
            pinned_offsets=jnp.asarray(off_pin.astype(np.int32)),
        )
        state, metrics = step_fn(state, key, batch)
        hist.append(
            (
                float(metrics["dur_loss"]),
                float(metrics["prior_loss"]),
                float(metrics["diff_loss"]),
            )
        )
    return state, np.asarray(hist)


@pytest.mark.slow
def test_training_convergence_parity(ref_small):
    torch, ref_model = ref_small
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts

    import jax

    # materialize: the converter's arrays can alias the live torch tensors,
    # which train_reference then mutates in place
    params0 = jax.tree_util.tree_map(
        np.copy, convert_grad_tts(ref_model.state_dict(), n_enc_layers=N_LAYERS)
    )
    batches = make_corpus()

    hist_t = train_reference(torch, ref_model, batches)
    state, hist_j = train_ours(params0, batches)

    tot_t, tot_j = hist_t.sum(1), hist_j.sum(1)

    # 1. step-0 losses identical (same weights, data, and draws)
    np.testing.assert_allclose(hist_j[0], hist_t[0], rtol=3e-3, atol=1e-4)

    # 2. trajectories track step for step. The smooth losses (prior, diff)
    #    must stay within fp-drift bands the whole run (measured max rel
    #    3.6e-3 / 8.4e-3 at 60 steps). The duration loss goes through MAS's
    #    discrete path choice, so once it's nearly converged (~0.02) tiny
    #    weight drift flips alignment paths and its *relative* error is
    #    meaningless — bound it absolutely (measured max |Δ| 0.106).
    rel_prior = np.abs(hist_j[:, 1] - hist_t[:, 1]) / np.abs(hist_t[:, 1])
    rel_diff = np.abs(hist_j[:, 2] - hist_t[:, 2]) / np.abs(hist_t[:, 2])
    abs_dur = np.abs(hist_j[:, 0] - hist_t[:, 0])
    assert rel_prior.max() < 0.02, f"prior divergence {rel_prior.max():.4f}"
    assert rel_diff.max() < 0.04, f"diff divergence {rel_diff.max():.4f}"
    assert abs_dur.max() < 0.3, f"dur divergence {abs_dur.max():.4f}"
    rel_tot = np.abs(tot_j - tot_t) / np.abs(tot_t)
    assert rel_tot[:10].max() < 0.01, f"early divergence {rel_tot[:10].max():.4f}"

    # 3. both sides actually learned (not just tracked each other)
    assert tot_t[-5:].mean() < 0.75 * tot_t[:5].mean()
    assert tot_j[-5:].mean() < 0.75 * tot_j[:5].mean()

    # 4. final weights agree tree-wise: convert the trained torch state and
    #    diff against our trained params
    params_ref_final = convert_grad_tts(
        ref_model.state_dict(), n_enc_layers=N_LAYERS
    )
    flat_ours = jax.tree_util.tree_leaves_with_path(state.params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(params_ref_final))
    worst = 0.0
    for path, leaf in flat_ours:
        ref_leaf = np.asarray(flat_ref[path])
        scale = max(1.0, float(np.abs(ref_leaf).max()))
        worst = max(worst, float(np.abs(np.asarray(leaf) - ref_leaf).max()) / scale)
    assert worst < 0.05, f"trained-weight divergence {worst:.4f}"

    # 5a. trained encoder outputs stay within the drift band on a fixed
    #     batch. The ~5% weight drift (from MAS's discrete path flips under
    #     fp noise — see #2/#4) amplifies to ~10% encoder-output divergence;
    #     anything beyond ~20% would indicate a semantic difference, not
    #     drift (measured 0.099 at 60 steps).
    import jax.numpy as jnp

    from arttts_tpu.models.tts import GradTTSModel

    model = GradTTSModel(config=_our_config())
    x = batches[0]["x"][:2]
    xl = batches[0]["x_lengths"][:2]
    ref_model.eval()
    with torch.no_grad():
        mu_t, logw_t, _ = ref_model.encoder(
            torch.from_numpy(x), torch.from_numpy(xl)
        )
    mu_j, logw_j, _ = model.apply(
        {"params": state.params}, jnp.asarray(x), jnp.asarray(xl), method="encode"
    )
    mu_rel = np.linalg.norm(
        np.asarray(mu_j) - mu_t.permute(0, 2, 1).numpy()
    ) / np.linalg.norm(mu_t.numpy())
    assert mu_rel < 0.2, f"trained-encoder rel L2 {mu_rel:.4f}"

    # 5b. trained-QUALITY parity on full predicted-duration synthesis: at 60
    #     chaotically-diverged steps the two models emit different frame
    #     counts (duration ceil() flips), so compare each model's
    #     DTW-distance-to-the-corpus-target (the reference's own quanti
    #     protocol) — both must land in the same quality band, and ours must
    #     be a large improvement over the untrained model (i.e. training in
    #     this framework converges toward the target like the reference's).
    #     Measured: torch 18.8, jax 14.1, untrained ~2x worse.
    from arttts_tpu.eval.metrics import normalized_dtw_score
    from arttts_tpu.infer.sampler import synthesize

    x1 = x[:1]
    xl1 = np.array([int(xl[0])], np.int64)
    with torch.no_grad():
        _, dec_t, _ = ref_model(
            torch.from_numpy(x1), torch.from_numpy(xl1),
            n_timesteps=4, temperature=1e6, stoc=False,
        )
    dec_t_np = dec_t.permute(0, 2, 1).numpy()[0]

    def _synth_quality(params):
        _, dec_j, _, y_len = synthesize(
            model, {"params": params}, jax.random.PRNGKey(0),
            jnp.asarray(x1), jnp.asarray(xl1), n_timesteps=4,
            max_frames=192, temperature=1e6,
        )
        return np.asarray(dec_j)[0, : int(np.asarray(y_len)[0])]

    target = batches[0]["y"][0][: batches[0]["y_lengths"][0]]
    q_t, _, _ = normalized_dtw_score(dec_t_np, target)
    q_j, _, _ = normalized_dtw_score(_synth_quality(state.params), target)
    q_0, _, _ = normalized_dtw_score(_synth_quality(params0), target)
    assert q_j < 0.85 * q_0, f"no convergence: trained {q_j:.2f} vs init {q_0:.2f}"
    assert abs(q_t - q_j) <= 0.5 * max(q_t, q_j), (
        f"quality band: torch {q_t:.2f} vs jax {q_j:.2f}"
    )
