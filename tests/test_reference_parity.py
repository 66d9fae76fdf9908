"""TRUE output parity vs the reference PyTorch implementation.

Imports the reference's `GradTTS` (torch, CPU) from /root/reference/src with
its Cython MAS stubbed by our NumPy oracle, builds it with random weights at
the full v2 hyperparameters, converts the state dict through
`convert_grad_tts`, and compares:

  1. encoder forward (mu, logw) — RNG-free, must match to fp32 tolerance;
  2. diffusion estimator forward — RNG-free, must match;
  3. full text->mel inference with pinned durations and temperature=1e6
     (terminal noise ~ 0) — deterministic end-to-end parity of the
     50-step... (4-step here) Euler sampler.

This is the SURVEY.md §4 "golden-parity" tier, run against the reference
code itself rather than a transcription.
"""

import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_gradtts():
    torch = pytest.importorskip("torch")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    # stub the Cython MAS package before the reference model package imports it
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
    from model.tts import GradTTS  # noqa: E402  (reference import)

    torch.manual_seed(0)
    m = GradTTS(
        149,  # n_vocab
        1,    # n_spks
        None,  # spk_emb_dim
        192, 768, 256,  # channels / filter / filter_dp
        2, 6, 3, 0.1, 4,  # heads / layers / kernel / dropout / window
        80, 64, 0.05, 20.0, 1000,  # n_feats / dec_dim / betas / pe_scale
    )
    m.eval()
    return torch, m


@pytest.fixture(scope="module")
def converted(ref_gradtts):
    torch, m = ref_gradtts
    from arttts_tpu.core.config import get_preset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts

    params = convert_grad_tts(m.state_dict())
    model = GradTTSModel(config=get_preset("v2").model)
    return model, {"params": params}


def test_encoder_parity(ref_gradtts, converted, rng):
    torch, m = ref_gradtts
    model, variables = converted
    import jax.numpy as jnp

    x = rng.integers(1, 149, size=(2, 21)).astype(np.int64)
    xl = np.array([21, 15], dtype=np.int64)
    x[1, 15:] = 0
    with torch.no_grad():
        mu_t, logw_t, mask_t = m.encoder(torch.from_numpy(x), torch.from_numpy(xl))
    mu_j, logw_j, mask_j = model.apply(
        variables, jnp.asarray(x), jnp.asarray(xl), method="encode"
    )
    np.testing.assert_allclose(
        np.asarray(mu_j), mu_t.permute(0, 2, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logw_j), logw_t.permute(0, 2, 1).numpy(), atol=2e-4
    )


def test_estimator_parity(ref_gradtts, converted, rng):
    torch, m = ref_gradtts
    model, variables = converted
    import jax.numpy as jnp

    B, T, F = 2, 36, 80
    xt = rng.standard_normal((B, T, F)).astype(np.float32)
    mu = rng.standard_normal((B, T, F)).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)
    mask = np.ones((B, T, 1), np.float32)
    with torch.no_grad():
        out_t = m.decoder.estimator(
            torch.from_numpy(xt).permute(0, 2, 1),
            torch.from_numpy(mask).permute(0, 2, 1),
            torch.from_numpy(mu).permute(0, 2, 1),
            torch.from_numpy(t),
        )
    out_j = model.apply(
        variables, jnp.asarray(xt), jnp.asarray(mask), jnp.asarray(mu),
        jnp.asarray(t), method="estimate_noise",
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 1).numpy(), atol=5e-4
    )


def test_full_inference_parity(ref_gradtts, converted, rng):
    """Deterministic end-to-end: pinned durations, temperature=1e6 (z ~ mu),
    4 Euler steps."""
    torch, m = ref_gradtts
    model, variables = converted
    import jax
    import jax.numpy as jnp

    from arttts_tpu.infer.sampler import synthesize

    from arttts_tpu.ops.shape import fix_len_compatibility

    T_x = 10
    x = rng.integers(1, 149, size=(1, T_x)).astype(np.int64)
    xl = np.array([T_x], dtype=np.int64)
    with torch.no_grad():
        enc_t, dec_t, attn_t = m(
            torch.from_numpy(x), torch.from_numpy(xl), n_timesteps=4,
            temperature=1e6, stoc=False,
        )
    y_max = dec_t.shape[-1]  # reference's dynamic output length
    enc_j, dec_j, attn_j, y_len = synthesize(
        model, variables, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xl),
        n_timesteps=4, max_frames=fix_len_compatibility(y_max), temperature=1e6,
    )
    assert int(np.asarray(y_len)[0]) == y_max
    # encoder path amplifies nothing; decoder runs 4 Euler steps that amplify
    # the O(1e-6) difference between torch/jax terminal noise draws, so the
    # decoder tolerance is relative-dominated (observed rel err ~4e-4).
    np.testing.assert_allclose(
        np.asarray(enc_j)[:, :y_max], enc_t.permute(0, 2, 1).numpy(),
        atol=1e-2, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dec_j)[:, :y_max], dec_t.permute(0, 2, 1).numpy(),
        atol=2e-2, rtol=2e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(attn_j)[:, :, :y_max], attn_t[:, 0].numpy()
    )


# ---------------------------------------------------------------------------
# ArtTTS (trait encoder) and the 1D decoder family
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_attention_tts(ref_gradtts):
    torch, _ = ref_gradtts  # ensures sys.path + MAS stub are in place
    from model.tts import AttentionTTS

    torch.manual_seed(1)
    m = AttentionTTS(
        25, 1, None, 192, 768, 256, 1, 6, 3, 0.1, 4, 16, 64, 0.05, 20.0, 1000
    )
    m.eval()
    return torch, m


def test_arttts_1d_full_parity(ref_attention_tts, rng):
    """AttentionTTS: trait encoder + Diffusion1D decoder, full inference with
    pinned durations (ArtTTS family supports x_durations)."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts
    from arttts_tpu.infer.sampler import synthesize

    torch, m = ref_attention_tts
    params = convert_grad_tts(m.state_dict(), decoder_kind="unet1d")
    model = GradTTSModel(config=get_preset("v5").model)
    variables = {"params": params}

    T_x = 8
    x = rng.integers(-1, 2, size=(1, T_x, 25)).astype(np.float32)
    xl = np.array([T_x], dtype=np.int64)
    dur = np.full((1, T_x), 4.0, np.float32)  # 32 frames
    with torch.no_grad():
        enc_t, dec_t, attn_t = m(
            torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(xl),
            n_timesteps=3, temperature=1e6, stoc=False,
            x_durations=torch.from_numpy(dur),
        )
    enc_j, dec_j, attn_j, y_len = synthesize(
        model, variables, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xl),
        n_timesteps=3, max_frames=32, temperature=1e6,
        x_durations=jnp.asarray(dur),
    )
    y_max = dec_t.shape[-1]
    assert int(np.asarray(y_len)[0]) == y_max == 32
    np.testing.assert_allclose(
        np.asarray(enc_j)[:, :y_max], enc_t.permute(0, 2, 1).numpy(),
        atol=1e-2, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dec_j)[:, :y_max], dec_t.permute(0, 2, 1).numpy(),
        atol=2e-2, rtol=2e-3,
    )


def test_preblock_estimator_parity(ref_gradtts, rng):
    """Diffusion1DPreblock estimator forward vs reference."""
    import jax.numpy as jnp

    torch, _ = ref_gradtts
    from model.tts import AttentionTTSPreblock

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts

    torch.manual_seed(2)
    m = AttentionTTSPreblock(
        25, 1, None, 192, 768, 256, 1, 6, 3, 0.1, 4, 16, 64, 0.05, 20.0, 1000
    )
    m.eval()
    params = convert_grad_tts(m.state_dict(), decoder_kind="unet1d_preblock")
    model = GradTTSModel(config=get_preset("v5_preblock").model)

    B, T, F = 2, 24, 16
    xt = rng.standard_normal((B, T, F)).astype(np.float32)
    mu = rng.standard_normal((B, T, F)).astype(np.float32)
    t = np.array([0.2, 0.9], dtype=np.float32)
    mask = np.ones((B, T, 1), np.float32)
    with torch.no_grad():
        out_t = m.decoder.estimator(
            torch.from_numpy(xt).permute(0, 2, 1),
            torch.from_numpy(mask).permute(0, 2, 1),
            torch.from_numpy(mu).permute(0, 2, 1),
            torch.from_numpy(t),
        )
    out_j = model.apply(
        {"params": params}, jnp.asarray(xt), jnp.asarray(mask), jnp.asarray(mu),
        jnp.asarray(t), method="estimate_noise",
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 1).numpy(), atol=1e-3, rtol=1e-3
    )


def test_training_loss_parity(ref_gradtts, converted, rng):
    """compute_loss parity: pin the reference's RNG draws (t, z, segment
    offset) and rebuild the identical loss from our pure functions —
    dur/prior/diff must match."""
    import jax.numpy as jnp

    torch, m = ref_gradtts
    model, variables = converted

    from arttts_tpu.models.diffusion_sde import (
        diffusion_loss_from_estimate, get_noise,
    )
    from arttts_tpu.ops.mas import maximum_path
    from arttts_tpu.ops.shape import duration_loss, sequence_mask
    from arttts_tpu.train.losses import mas_log_prior, prior_loss_fn

    B, T_x, T_y, F = 2, 12, 48, 80
    out_size = 32
    x = rng.integers(1, 149, size=(B, T_x)).astype(np.int64)
    xl = np.array([T_x, 9], dtype=np.int64)
    x[1, 9:] = 0
    y = rng.standard_normal((B, T_y, F)).astype(np.float32)
    yl = np.array([T_y, 40], dtype=np.int64)
    y[1, 40:] = 0
    t_fixed = np.array([0.37, 0.81], dtype=np.float32)
    z_fixed = rng.standard_normal((B, F, out_size)).astype(np.float32)

    # --- reference with pinned RNG ------------------------------------
    import random as _pyrandom

    orig_rand, orig_randn, orig_choice = torch.rand, torch.randn, _pyrandom.choice
    try:
        torch.rand = lambda *a, **k: torch.from_numpy(t_fixed.copy())
        torch.randn = lambda *a, **k: torch.from_numpy(z_fixed.copy())
        _pyrandom.choice = lambda seq: 0  # segment offset 0
        with torch.no_grad():
            dur_t, prior_t, diff_t = m.compute_loss(
                torch.from_numpy(x), torch.from_numpy(xl),
                torch.from_numpy(np.transpose(y, (0, 2, 1))),
                torch.from_numpy(yl), out_size=out_size,
            )
    finally:
        torch.rand, torch.randn, _pyrandom.choice = orig_rand, orig_randn, orig_choice

    # --- ours, same pinned values -------------------------------------
    import jax

    mu_x, logw, x_mask = model.apply(
        variables, jnp.asarray(x), jnp.asarray(xl), method="encode"
    )
    y_j = jnp.asarray(y)
    y_mask = sequence_mask(jnp.asarray(yl), T_y).astype(jnp.float32)[:, :, None]
    log_prior, attn_mask = mas_log_prior(mu_x, y_j, x_mask, y_mask)
    attn = maximum_path(log_prior, attn_mask)
    logw_hat = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * x_mask
    dur_j = duration_loss(logw, logw_hat, jnp.asarray(xl.astype(np.float32)))

    # offset-0 segment cut
    y_seg = y_j[:, :out_size]
    attn_seg = attn[:, :, :out_size]
    seg_len = jnp.minimum(jnp.asarray(yl), out_size)
    y_seg_mask = sequence_mask(seg_len, out_size).astype(jnp.float32)[:, :, None]
    mu_y = jnp.einsum("bij,bic->bjc", attn_seg, mu_x)

    dec = model.config.decoder
    t_j = jnp.asarray(t_fixed)
    cum = get_noise(t_j[:, None, None], dec.beta_min, dec.beta_max, cumulative=True)
    z_j = jnp.asarray(np.transpose(z_fixed, (0, 2, 1)))
    mean = y_seg * jnp.exp(-0.5 * cum) + mu_y * (1 - jnp.exp(-0.5 * cum))
    xt = (mean + z_j * jnp.sqrt(1 - jnp.exp(-cum))) * y_seg_mask
    noise_est = model.apply(
        variables, xt, y_seg_mask, mu_y, t_j, method="estimate_noise"
    )
    diff_j = diffusion_loss_from_estimate(
        noise_est, z_j * y_seg_mask, y_seg_mask, t_j, F, dec.beta_min, dec.beta_max
    )
    prior_j = prior_loss_fn(y_seg * y_seg_mask, mu_y, y_seg_mask, F)

    np.testing.assert_allclose(float(dur_j), float(dur_t), rtol=2e-4)
    np.testing.assert_allclose(float(prior_j), float(prior_t), rtol=2e-4)
    np.testing.assert_allclose(float(diff_j), float(diff_t), rtol=2e-3)


def test_grad_ttartic_full_parity(ref_gradtts, rng):
    """Multi-speaker GradTTArtic full inference parity: aligned durations in
    input channel 26, SSL speaker pre-embedding path, always-on spk U-Net
    channel."""
    import jax
    import jax.numpy as jnp

    torch, _ = ref_gradtts  # path + MAS stub
    from model_ms.tts import GradTTArtic

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import synthesize
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_ttartic

    torch.manual_seed(3)
    # full params_v6.py hyperparameters (n_heads=2 — params_v6.py:44)
    m = GradTTArtic(
        26, 64, 192, 768, 256, 2, 6, 3, 0.1, 4, 16, 64, 0.05, 20.0, 1000
    )
    m.eval()
    params = convert_grad_ttartic(m.state_dict())
    model = GradTTSModel(config=get_preset("v6").model)
    variables = {"params": params}

    T_x = 6
    x = rng.integers(-1, 2, size=(1, T_x, 26)).astype(np.float32)
    counts = np.array([4, 8, 4, 8, 4, 4], np.float32)
    x[0, :, 25] = counts  # channel 26: repetition counts (sum 32, mult of 4)
    xl = np.array([T_x], dtype=np.int64)
    spk_ft = rng.standard_normal((1, 1024)).astype(np.float32)

    with torch.no_grad():
        enc_t, dec_t, attn_t = m(
            torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(xl),
            torch.from_numpy(spk_ft), n_timesteps=3, temperature=1e6, stoc=False,
        )
    y_max = dec_t.shape[-1]
    enc_j, dec_j, attn_j, y_len = synthesize(
        model, variables, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xl),
        n_timesteps=3, max_frames=32, temperature=1e6,
        spk=jnp.asarray(spk_ft), x_durations=jnp.asarray(counts[None]),
    )
    assert int(np.asarray(y_len)[0]) == y_max == 32
    np.testing.assert_allclose(
        np.asarray(enc_j)[:, :y_max], enc_t.permute(0, 2, 1).numpy(),
        atol=1e-2, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(dec_j)[:, :y_max], dec_t.permute(0, 2, 1).numpy(),
        atol=2e-2, rtol=2e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(attn_j)[:, :, :y_max], attn_t[:, 0].numpy()
    )


def test_arttts_v1_full_parity(ref_gradtts, rng):
    """ArtTTS (v1): trait encoder + 2D U-Net at n_feats=16, pinned durations."""
    import jax
    import jax.numpy as jnp

    torch, _ = ref_gradtts
    from model.tts import ArtTTS

    from arttts_tpu.core.config import get_preset
    from arttts_tpu.infer.sampler import synthesize
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.utils.torch_convert_acoustic import convert_grad_tts

    torch.manual_seed(4)
    m = ArtTTS(
        25, 1, None, 192, 768, 256, 1, 6, 3, 0.1, 4, 16, 64, 0.05, 20.0, 1000
    )
    m.eval()
    params = convert_grad_tts(m.state_dict())
    model = GradTTSModel(config=get_preset("v1").model)
    variables = {"params": params}

    T_x = 7
    x = rng.integers(-1, 2, size=(1, T_x, 25)).astype(np.float32)
    xl = np.array([T_x], dtype=np.int64)
    dur = np.full((1, T_x), 4.0, np.float32)  # 28 frames (mult of 4)
    with torch.no_grad():
        enc_t, dec_t, attn_t = m(
            torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(xl),
            n_timesteps=3, temperature=1e6, stoc=False,
            x_durations=torch.from_numpy(dur),
        )
    enc_j, dec_j, attn_j, y_len = synthesize(
        model, variables, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(xl),
        n_timesteps=3, max_frames=28, temperature=1e6,
        x_durations=jnp.asarray(dur),
    )
    y_max = dec_t.shape[-1]
    assert int(np.asarray(y_len)[0]) == y_max == 28
    np.testing.assert_allclose(
        np.asarray(dec_j)[:, :y_max], dec_t.permute(0, 2, 1).numpy(),
        atol=2e-2, rtol=2e-3,
    )
