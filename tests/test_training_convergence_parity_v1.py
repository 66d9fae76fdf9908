"""Third-family convergence-parity study: ArtTTS (the v1 ipa_trait recipe)
vs the reference torch trainer — the family where the ternary-trait encoder
prenet + MAS + duration-predictor plumbing could silently diverge (the v6
study covers aligned durations WITHOUT MAS; the GradTTS study covers MAS
WITHOUT trait inputs; v1 exercises both together, matching
`/root/reference/src/train_v1.py:91-199`).

Same pinned-RNG technique as `test_training_convergence_parity.py`:
identical converted initial weights, identical synthetic trait corpus and
batch order, the three per-step draws (t, z, segment offsets) shared from
one numpy generator, and the reference's exact optimizer recipe
(Adam + max-norm-1 clip on encoder and decoder, train_v1.py:140,189-192).
"""

import random as _pyrandom
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

# tiny-but-real ArtTTS v1 hyperparameters (trait encoder + 2D U-Net)
N_IPA = 25  # ternary trait channels (configs/params_v1.py n_ipa_feats)
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
    from model.tts import ArtTTS

    torch.manual_seed(23)
    m = ArtTTS(
        N_IPA, 1, None, ENC_CH, FILT, FILT_DP, N_HEADS, N_LAYERS, KERNEL,
        0.0, WINDOW, N_FEATS, DEC_DIM, BETA_MIN, BETA_MAX, PE_SCALE,
    )
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    m.train()
    return torch, m


def _our_config():
    from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig

    return ModelConfig(
        name="art_tts",
        n_feats=N_FEATS,
        n_spks=1,
        encoder=EncoderConfig(
            kind="ipa_trait", n_input_feats=N_IPA, n_channels=ENC_CH,
            filter_channels=FILT, filter_channels_dp=FILT_DP,
            n_heads=N_HEADS, n_layers=N_LAYERS, kernel_size=KERNEL,
            dropout=0.0, window_size=WINDOW, prenet_dropout=0.0,
        ),
        decoder=DecoderConfig(kind="unet2d", dim=DEC_DIM),
    )


def make_corpus(seed=77):
    """Trait corpus with learnable structure: each phone is a random ternary
    trait row; its target is a fixed linear map of the trait vector held for
    4 frames plus small noise — MAS must discover the 4x alignment and the
    duration predictor must learn the constant durations from it."""
    g = np.random.default_rng(seed)
    W = (g.standard_normal((N_IPA, N_FEATS)) * 0.6).astype(np.float32)
    N = 2 * B
    x = np.zeros((N, T_X, N_IPA), np.float32)
    x_lengths = np.array([12, 10, 11, 12, 9, 12, 10, 11], dtype=np.int64)
    y = np.zeros((N, T_Y, N_FEATS), np.float32)
    y_lengths = 4 * x_lengths
    for i in range(N):
        L = x_lengths[i]
        traits = g.integers(-1, 2, size=(L, N_IPA)).astype(np.float32)
        x[i, :L] = traits
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


def train_reference(torch, model, batches, n_steps=N_STEPS, seed=444):
    """The v1 recipe (train_v1.py:140,183-199) with pinned draws."""
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
                torch.from_numpy(np.transpose(b["x"], (0, 2, 1)).copy()),
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
                (float(dur.detach()), float(prior.detach()), float(diff.detach()))
            )
    finally:
        torch.rand, torch.randn, _pyrandom.choice = orig_rand, orig_randn, orig_choice
    return np.asarray(hist)


def train_ours(params0, batches, n_steps=N_STEPS, seed=444):
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
def test_v1_training_convergence_parity(ref_model):
    torch, ref = ref_model
    import jax

    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts

    params0 = jax.tree_util.tree_map(
        np.copy, convert_grad_tts(ref.state_dict(), n_enc_layers=N_LAYERS)
    )
    batches = make_corpus()

    hist_t = train_reference(torch, ref, batches)
    state, hist_j = train_ours(params0, batches)

    tot_t, tot_j = hist_t.sum(1), hist_j.sum(1)

    # 1. step-0 losses identical (same weights, data, draws)
    np.testing.assert_allclose(hist_j[0], hist_t[0], rtol=3e-3, atol=1e-4)

    # 2. smooth losses track step for step; the dur loss goes through MAS's
    #    discrete path choice, so bound it absolutely (same bands as the
    #    GradTTS study).
    rel_prior = np.abs(hist_j[:, 1] - hist_t[:, 1]) / np.abs(hist_t[:, 1])
    rel_diff = np.abs(hist_j[:, 2] - hist_t[:, 2]) / np.abs(hist_t[:, 2])
    abs_dur = np.abs(hist_j[:, 0] - hist_t[:, 0])
    assert rel_prior.max() < 0.02, f"prior divergence {rel_prior.max():.4f}"
    assert rel_diff.max() < 0.04, f"diff divergence {rel_diff.max():.4f}"
    assert abs_dur.max() < 0.3, f"dur divergence {abs_dur.max():.4f}"

    # 3. both sides actually learned
    assert tot_t[-5:].mean() < 0.75 * tot_t[:5].mean()
    assert tot_j[-5:].mean() < 0.75 * tot_j[:5].mean()

    # 4. final weights agree tree-wise
    params_ref_final = convert_grad_tts(ref.state_dict(), n_enc_layers=N_LAYERS)
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

    # 5. trained synthesis parity on a fixed sample with pinned durations
    #    (both sides emit the same frame count; temperature=1e6 kills
    #    terminal noise; 4 Euler steps).
    import jax.numpy as jnp

    from arttts_tpu.infer.sampler import synthesize
    from arttts_tpu.models.tts import GradTTSModel

    model = GradTTSModel(config=_our_config())
    b = batches[0]
    x1, xl1 = b["x"][:1], b["x_lengths"][:1]
    dur1 = np.full((1, T_X), 4.0, np.float32)
    ref.eval()
    with torch.no_grad():
        _, dec_t, _ = ref(
            torch.from_numpy(np.transpose(x1, (0, 2, 1)).copy()),
            torch.from_numpy(xl1),
            n_timesteps=4, temperature=1e6, stoc=False,
            x_durations=torch.from_numpy(dur1),
        )
    dec_t_np = dec_t.permute(0, 2, 1).numpy()
    _, dec_j, _, y_len = synthesize(
        model, {"params": state.params}, jax.random.PRNGKey(0),
        jnp.asarray(x1), jnp.asarray(xl1), n_timesteps=4,
        max_frames=dec_t_np.shape[1], temperature=1e6,
        x_durations=jnp.asarray(dur1),
    )
    n = int(np.asarray(y_len)[0])
    rel = np.linalg.norm(np.asarray(dec_j)[0, :n] - dec_t_np[0, :n]) / (
        np.linalg.norm(dec_t_np[0, :n]) + 1e-9
    )
    assert rel < 0.1, f"trained-synthesis rel L2 {rel:.4f}"
