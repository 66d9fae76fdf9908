"""Second-family convergence-parity study (VERDICT r02 #5): GradTTArtic
(the v6 multi-speaker/aligned-duration recipe) vs the reference torch
trainer — the family where the trait-table plumbing, aligned-duration path,
and SSL speaker pre-embedding could silently diverge.

Same pinned-RNG technique as `test_training_convergence_parity.py` (which
covers GradTTS/v2): identical converted initial weights, identical synthetic
corpus and batch order, the three per-step stochastic draws (t, z, segment
offsets) shared from one numpy generator — monkeypatched into the reference
(`/root/reference/src/model_ms/tts.py:213`, `model_ms/diffusion.py:288,336`)
and pinned into our jitted step via the batch's `pinned_*` fields — and the
reference's exact optimizer recipe: Adam + max-norm-1 clip on encoder and
decoder ONLY (the SpeakerEncodingLayer is unclipped,
`train_v6.py:184-189`).
"""

import random as _pyrandom
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

# tiny-but-real GradTTArtic hyperparameters. spk_emb_dim MUST be 64: the
# reference constructor never forwards it to the ms IpaTraitEncoder, whose
# default is 64 (model_ms/tts.py:79-91, phnm_encoder.py:339) — any other
# value crashes the reference itself.
N_IPA = 26  # 24 traits + silence + repetition-count channel
SPK_EMB, SPK_PREEMB = 64, 64
ENC_CH, FILT, FILT_DP = 48, 96, 64
N_HEADS, N_LAYERS, KERNEL, WINDOW = 1, 2, 3, 2
N_FEATS, DEC_DIM = 16, 16
BETA_MIN, BETA_MAX, PE_SCALE = 0.05, 20.0, 1000
LR = 1e-3
OUT_SIZE = 32
B, T_X, T_Y = 4, 12, 48
N_STEPS = 60


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from model_ms.tts import GradTTArtic

    torch.manual_seed(11)
    m = GradTTArtic(
        N_IPA, SPK_EMB, ENC_CH, FILT, FILT_DP, N_HEADS, N_LAYERS, KERNEL,
        0.0, WINDOW, N_FEATS, DEC_DIM, BETA_MIN, BETA_MAX, PE_SCALE,
        spk_preemb_dim=SPK_PREEMB,
    )
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    m.train()
    return torch, m


def _our_config():
    from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig

    return ModelConfig(
        name="grad_ttartic",
        n_feats=N_FEATS,
        n_spks=2,  # >1 enables the spk-conditioned decoder channel
        spk_emb_dim=SPK_EMB,
        spk_preemb_dim=SPK_PREEMB,
        encoder=EncoderConfig(
            kind="ipa_trait", n_input_feats=N_IPA, n_channels=ENC_CH,
            filter_channels=FILT, filter_channels_dp=FILT_DP,
            n_heads=N_HEADS, n_layers=N_LAYERS, kernel_size=KERNEL,
            dropout=0.0, window_size=WINDOW, prenet_dropout=0.0,
            use_duration_predictor=False,
        ),
        decoder=DecoderConfig(kind="unet2d", dim=DEC_DIM),
    )


def make_corpus(seed=321):
    """Aligned-input corpus with learnable structure: each phone is a random
    ternary trait row; its target frames are a fixed linear map of the trait
    vector, held for its repetition count (channel 26), plus small noise."""
    g = np.random.default_rng(seed)
    W = (g.standard_normal((N_IPA - 1, N_FEATS)) * 0.6).astype(np.float32)
    N = 2 * B
    x = np.zeros((N, T_X, N_IPA), np.float32)
    x_lengths = np.array([12, 10, 11, 12, 9, 12, 10, 11], dtype=np.int64)
    y = np.zeros((N, T_Y, N_FEATS), np.float32)
    y_lengths = 4 * x_lengths  # counts sum to 4 * n_phones <= T_Y
    spk_ft = g.standard_normal((N, SPK_PREEMB)).astype(np.float32)
    for i in range(N):
        L = x_lengths[i]
        traits = g.integers(-1, 2, size=(L, N_IPA - 1)).astype(np.float32)
        x[i, :L, : N_IPA - 1] = traits
        x[i, :L, N_IPA - 1] = 4.0  # repetition counts (channel 26)
        frames = np.repeat(traits @ W, 4, axis=0)
        y[i, : y_lengths[i]] = frames + 0.05 * g.standard_normal(
            (y_lengths[i], N_FEATS)
        ).astype(np.float32)
    batches = [
        dict(
            x=x[k * B:(k + 1) * B],
            x_lengths=x_lengths[k * B:(k + 1) * B],
            y=y[k * B:(k + 1) * B],
            y_lengths=y_lengths[k * B:(k + 1) * B],
            spk=spk_ft[k * B:(k + 1) * B],
            durations=x[k * B:(k + 1) * B, :, N_IPA - 1],
        )
        for k in range(2)
    ]
    return batches


def draw_step_noise(g, y_lengths):
    t = (0.05 + 0.9 * g.random(B)).astype(np.float32)
    z = g.standard_normal((B, N_FEATS, OUT_SIZE)).astype(np.float32)
    max_off = np.maximum(y_lengths - OUT_SIZE, 1)
    off = (g.random(B) * max_off).astype(np.int64)
    return t, z, off


def train_reference(torch, model, batches, n_steps=N_STEPS, seed=555):
    """The v6 recipe (train_v6.py:176-190) with pinned draws."""
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
            prior, diff = model.compute_loss(
                torch.from_numpy(np.transpose(b["x"], (0, 2, 1)).copy()),
                torch.from_numpy(b["x_lengths"]),
                torch.from_numpy(np.transpose(b["y"], (0, 2, 1)).copy()),
                torch.from_numpy(b["y_lengths"]),
                torch.from_numpy(b["spk"]),
                out_size=OUT_SIZE,
            )
            loss = prior + diff
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.encoder.parameters(), max_norm=1)
            torch.nn.utils.clip_grad_norm_(model.decoder.parameters(), max_norm=1)
            opt.step()
            hist.append((float(prior.detach()), float(diff.detach())))
    finally:
        torch.rand, torch.randn, _pyrandom.choice = orig_rand, orig_randn, orig_choice
    return np.asarray(hist)


def train_ours(params0, batches, n_steps=N_STEPS, seed=555):
    import jax
    import jax.numpy as jnp

    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.losses import grad_ttartic_loss
    from arttts_tpu.train.step import create_train_state, make_train_step

    g = np.random.default_rng(seed)
    model = GradTTSModel(config=_our_config())
    state = create_train_state(model, {"params": params0}, learning_rate=LR)
    step_fn = make_train_step(
        model, out_size=OUT_SIZE, loss_fn=grad_ttartic_loss, donate=False
    )
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
            spk=jnp.asarray(b["spk"]),
            durations=jnp.asarray(b["durations"]),
            pinned_t=jnp.asarray(t_pin),
            pinned_z=jnp.asarray(np.transpose(z_pin, (0, 2, 1)).copy()),
            pinned_offsets=jnp.asarray(off_pin.astype(np.int32)),
        )
        state, metrics = step_fn(state, key, batch)
        hist.append(
            (float(metrics["prior_loss"]), float(metrics["diff_loss"]))
        )
    return state, np.asarray(hist)


@pytest.mark.slow
def test_v6_training_convergence_parity(ref_model):
    torch, ref = ref_model
    import jax

    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_ttartic

    params0 = jax.tree_util.tree_map(
        np.copy, convert_grad_ttartic(ref.state_dict(), n_enc_layers=N_LAYERS)
    )
    batches = make_corpus()

    hist_t = train_reference(torch, ref, batches)
    state, hist_j = train_ours(params0, batches)

    tot_t, tot_j = hist_t.sum(1), hist_j.sum(1)

    # 1. step-0 losses identical (same weights, data, draws)
    np.testing.assert_allclose(hist_j[0], hist_t[0], rtol=3e-3, atol=1e-4)

    # 2. trajectories track step for step. No MAS in this family, so BOTH
    #    losses are smooth — tight relative bands the whole run.
    rel_prior = np.abs(hist_j[:, 0] - hist_t[:, 0]) / np.abs(hist_t[:, 0])
    rel_diff = np.abs(hist_j[:, 1] - hist_t[:, 1]) / np.abs(hist_t[:, 1])
    assert rel_prior.max() < 0.02, f"prior divergence {rel_prior.max():.4f}"
    assert rel_diff.max() < 0.04, f"diff divergence {rel_diff.max():.4f}"

    # 3. both sides actually learned
    assert tot_t[-5:].mean() < 0.75 * tot_t[:5].mean()
    assert tot_j[-5:].mean() < 0.75 * tot_j[:5].mean()

    # 4. final weights agree tree-wise (incl. the unclipped spk_encoder).
    #    Adam amplifies fp drift where gradients are tiny; measured worst
    #    leaf divergence 0.026 at 60 steps (same band as the GradTTS study).
    params_ref_final = convert_grad_ttartic(
        ref.state_dict(), n_enc_layers=N_LAYERS
    )
    flat_ours = jax.tree_util.tree_leaves_with_path(state.params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(params_ref_final))
    worst = 0.0
    for path, leaf in flat_ours:
        ref_leaf = np.asarray(flat_ref[path])
        scale = max(1.0, float(np.abs(ref_leaf).max()))
        worst = max(
            worst, float(np.abs(np.asarray(leaf) - ref_leaf).max()) / scale
        )
    assert worst < 0.05, f"trained-weight divergence {worst:.4f}"

    # 5. trained synthesis parity on a fixed sample: aligned durations mean
    #    both sides emit the SAME frame count, so outputs compare directly
    #    (temperature=1e6 kills terminal noise; 4 Euler steps).
    import jax.numpy as jnp

    from arttts_tpu.infer.sampler import synthesize
    from arttts_tpu.models.tts import GradTTSModel

    model = GradTTSModel(config=_our_config())
    b = batches[0]
    x1, xl1 = b["x"][:1], b["x_lengths"][:1]
    spk1 = b["spk"][:1]
    ref.eval()
    with torch.no_grad():
        _, dec_t, _ = ref(
            torch.from_numpy(np.transpose(x1, (0, 2, 1)).copy()),
            torch.from_numpy(xl1),
            torch.from_numpy(spk1),
            n_timesteps=4, temperature=1e6, stoc=False,
        )
    dec_t_np = dec_t.permute(0, 2, 1).numpy()
    _, dec_j, _, y_len = synthesize(
        model, {"params": state.params}, jax.random.PRNGKey(0),
        jnp.asarray(x1), jnp.asarray(xl1), n_timesteps=4,
        max_frames=dec_t_np.shape[1], temperature=1e6,
        spk=jnp.asarray(spk1), x_durations=jnp.asarray(b["durations"][:1]),
    )
    n = int(np.asarray(y_len)[0])
    rel = np.linalg.norm(np.asarray(dec_j)[0, :n] - dec_t_np[0, :n]) / (
        np.linalg.norm(dec_t_np[0, :n]) + 1e-9
    )
    assert rel < 0.1, f"trained-synthesis rel L2 {rel:.4f}"
