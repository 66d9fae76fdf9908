"""Reverse-diffusion sampling and end-to-end acoustic synthesis.

Equivalent of `Diffusion.reverse_diffusion` + `ArtTTS.forward`
(`/root/reference/src/model/diffusion.py:302-324`, `model/tts.py:84-165`),
restructured for XLA: the n-step Euler loop is a `lax.fori_loop` inside one
jitted program (the reference launches 50 separate U-Net graphs), and the
dynamic output length (`tts.py:132-137`) becomes a *static* bucketed
`max_frames` with masking — callers pick a bucket from the predicted duration
so jit caches a handful of shapes instead of recompiling per sentence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.models.diffusion_sde import get_noise
from arttts_tpu.models.unet2d_fast import make_score_fn
from arttts_tpu.ops.shape import fix_len_compatibility, generate_path, sequence_mask


def reverse_diffusion(
    model,
    variables,
    z,
    mask,
    mu,
    n_timesteps: int,
    stoc: bool = False,
    spk=None,
    rng: Optional[jax.Array] = None,
    sharded: bool = False,
    mesh=None,
    pallas: Optional[bool] = None,
):
    """Euler reverse-SDE/ODE sampler (diffusion.py:302-324).

    z, mu: (B, T, C); mask: (B, T, 1). Static n_timesteps.
    """
    dec = model.config.decoder
    h = 1.0 / n_timesteps
    B = z.shape[0]
    score_fn = make_score_fn(
        model, variables, T=z.shape[1], sharded=sharded, mesh=mesh,
        pallas=pallas,
    )

    def body(i, xt):
        t = (1.0 - (i + 0.5) * h) * jnp.ones((B,), z.dtype)
        noise_t = get_noise(t[:, None, None], dec.beta_min, dec.beta_max)
        score = score_fn(xt, mask, mu, t, spk)
        if stoc:
            dxt_det = (0.5 * (mu - xt) - score) * noise_t * h
            step_rng = jax.random.fold_in(rng, i)
            dxt_stoc = jax.random.normal(step_rng, z.shape, z.dtype) * jnp.sqrt(
                noise_t * h
            )
            dxt = dxt_det + dxt_stoc
        else:
            dxt = 0.5 * (mu - xt - score) * noise_t * h
        return (xt - dxt) * mask

    return jax.lax.fori_loop(0, n_timesteps, body, z * mask)


def reverse_diffusion_heun(
    model,
    variables,
    z,
    mask,
    mu,
    n_timesteps: int,
    spk=None,
    sharded: bool = False,
    mesh=None,
    pallas: Optional[bool] = None,
):
    """Second-order (Heun) probability-flow ODE sampler — an opt-in
    beyond-reference fast path: reaches the Euler sampler's solution with
    roughly 3-5x fewer score evaluations (each step costs two).

    Integrates the same ODE as `reverse_diffusion` (stoc=False):
        dx/dt = -0.5 * beta(t) * (mu - x - score(x, t))
    from t=1 to t=0 on a uniform midpoint grid.
    """
    dec = model.config.decoder
    h = 1.0 / n_timesteps
    B = z.shape[0]
    score_fn = make_score_fn(
        model, variables, T=z.shape[1], sharded=sharded, mesh=mesh,
        pallas=pallas,
    )

    def drift(xt, t_scalar):
        t = t_scalar * jnp.ones((B,), z.dtype)
        beta = get_noise(t[:, None, None], dec.beta_min, dec.beta_max)
        score = score_fn(xt, mask, mu, t, spk)
        return 0.5 * (mu - xt - score) * beta * h

    def body(i, xt):
        t = 1.0 - (i + 0.5) * h
        k1 = drift(xt, t)
        x_mid = (xt - k1) * mask
        k2 = drift(x_mid, jnp.maximum(t - h, 0.5 * h))
        return (xt - 0.5 * (k1 + k2)) * mask

    return jax.lax.fori_loop(0, n_timesteps, body, z * mask)


def reverse_diffusion_dpm2m(
    model,
    variables,
    z,
    mask,
    mu,
    n_timesteps: int,
    spk=None,
    t_end: float = 1e-2,
    sharded: bool = False,
    mesh=None,
    pallas: Optional[bool] = None,
):
    """DPM-Solver++(2M) for the probability-flow ODE — a beyond-reference
    fast path: ONE score evaluation per step (multistep second order), so
    ~10 evals reach what the reference's Euler sampler
    (`/root/reference/src/model/diffusion.py:302-324`) needs 50 for.

    The GradTTS SDE is VP around the encoder prior: with y = x - mu,
    alpha_t = exp(-0.5*Lambda(t)), sigma_t = sqrt(1 - exp(-Lambda(t))),
    Lambda the cumulative noise (`models/diffusion_sde.py:get_noise`), the
    model's score output s gives the noise prediction eps = -sigma_t * s and
    the data prediction x0 = (y + sigma_t^2 * s) / alpha_t. The standard
    exponential-integrator update (Lu et al. 2022, DPM-Solver++ Eq. 4.3)
    then applies verbatim on a uniform log-SNR grid from t=1 to `t_end`,
    with a first-order denoise-to-x0 final step (`lower_order_final`).

    `n_timesteps` counts model evaluations (>= 2). All schedule constants
    are trace-time numpy — the jitted program is a scan over N-1 steps.
    """
    if n_timesteps < 2:
        raise ValueError("dpm solver needs n_timesteps >= 2")
    dec = model.config.decoder
    bmin, bmax = float(dec.beta_min), float(dec.beta_max)
    bd = bmax - bmin
    B = z.shape[0]

    def lam_of_t(t):
        big_l = bmin * t + 0.5 * bd * t * t
        return np.log(np.exp(-0.5 * big_l) / np.sqrt(-np.expm1(-big_l)))

    lams = np.linspace(lam_of_t(1.0), lam_of_t(t_end), n_timesteps)
    # invert lambda -> t: Lambda = log(1 + e^{-2 lambda}); quadratic in t
    big_ls = np.logaddexp(0.0, -2.0 * lams)
    ts = (-bmin + np.sqrt(bmin * bmin + 2.0 * bd * big_ls)) / bd
    alphas = np.exp(-0.5 * big_ls)
    sigmas = np.sqrt(-np.expm1(-big_ls))
    hs = np.diff(lams)  # positive: lambda increases toward t=0

    # per-step constants for the scan (steps i = 0 .. N-2)
    n_upd = n_timesteps - 1
    a = np.ones(n_upd)
    b = np.zeros(n_upd)
    r = hs[:-1] / hs[1:]
    a[1:] = 1.0 + 1.0 / (2.0 * r)
    b[1:] = -1.0 / (2.0 * r)
    consts = jnp.asarray(
        np.stack(
            [
                ts[:-1],
                sigmas[:-1],
                alphas[:-1],
                sigmas[1:] / sigmas[:-1],
                alphas[1:] * np.expm1(-hs),
                a,
                b,
            ],
            axis=1,
        ),
        z.dtype,
    )

    score_fn = make_score_fn(
        model, variables, T=z.shape[1], sharded=sharded, mesh=mesh,
        pallas=pallas,
    )

    def score_x0(y, t_scalar, sig, alp):
        t = t_scalar * jnp.ones((B,), z.dtype)
        s = score_fn((mu + y) * mask, mask, mu, t, spk)
        return (y + sig * sig * s) / alp

    def step(carry, c):
        y, x0_prev = carry
        t_i, sig_i, alp_i, sig_ratio, alp_em1, a_i, b_i = c
        x0 = score_x0(y, t_i, sig_i, alp_i)
        d = a_i * x0 + b_i * x0_prev
        y_new = (sig_ratio * y - alp_em1 * d) * mask
        return (y_new, x0), None

    y0 = (z - mu) * mask
    (y_end, _), _ = jax.lax.scan(step, (y0, y0), consts)
    x0_final = score_x0(y_end, float(ts[-1]), float(sigmas[-1]), float(alphas[-1]))
    return (mu + x0_final) * mask


@functools.partial(jax.jit, static_argnames=("model",))
def encode_text(model, variables, x, x_lengths, spk=None):
    """One encoder pass for the two-dispatch serving path: returns
    (mu_x, logw, x_mask, pred_frames) where `pred_frames` (B,) is the
    total predicted frame count (sum of ceil durations) used host-side to
    pick the decoder bucket. The encodings then feed
    `synthesize_from_encoding` directly, so a real request runs the
    encoder ONCE (the r3 serving path ran it twice: once in
    `predict_lengths` for the bucket, again inside `synthesize`)."""
    mu_x, logw, x_mask = model.apply(
        variables, x, x_lengths, spk, method="encode"
    )
    w = jnp.exp(logw) * x_mask
    pred_frames = jnp.sum(jnp.ceil(w), axis=(1, 2))
    return mu_x, logw, x_mask, pred_frames


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "n_timesteps", "max_frames", "stoc", "solver", "mesh",
        "pallas",
    ),
)
def synthesize_from_encoding(
    model,
    variables,
    rng,
    mu_x,
    logw,
    x_mask,
    n_timesteps: int,
    max_frames: int,
    temperature: float = 1.0,
    stoc: bool = False,
    spk=None,
    length_scale: float = 1.0,
    x_durations: Optional[jnp.ndarray] = None,
    solver: str = "euler",
    mesh=None,
    pallas: Optional[bool] = None,
):
    """Diffusion decode from precomputed encoder outputs (`encode_text`):
    durations -> path -> mu_y -> z ~ N(mu_y, I/temperature) -> reverse
    diffusion. Returns (enc, dec, attn, y_lengths) exactly like
    `synthesize` — which is this function composed with the encoder in a
    single program."""
    rng_z, rng_stoc = jax.random.split(rng)
    if x_durations is not None:
        w = x_durations[:, :, None] * x_mask  # (B, T_x, 1)
    else:
        w = jnp.exp(logw) * x_mask
    w_ceil = jnp.ceil(w) * length_scale
    y_lengths = jnp.clip(
        jnp.sum(w_ceil, axis=(1, 2)), 1, max_frames
    ).astype(jnp.int32)

    y_mask = sequence_mask(y_lengths, max_frames).astype(x_mask.dtype)[:, :, None]
    attn_mask = x_mask[:, :, 0:1] * y_mask[:, None, :, 0]
    attn = generate_path(w_ceil[:, :, 0], attn_mask)  # (B, T_x, max_frames)

    mu_y = jnp.einsum("bij,bic->bjc", attn, mu_x)  # (B, max_frames, C)

    z = mu_y + jax.random.normal(rng_z, mu_y.shape, mu_y.dtype) / temperature
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        seq = NamedSharding(mesh, P(None, "model", None))
        z = jax.lax.with_sharding_constraint(z, seq)
        mu_y = jax.lax.with_sharding_constraint(mu_y, seq)
        y_mask = jax.lax.with_sharding_constraint(y_mask, seq)
    seq_sharded = mesh is not None and mesh.shape.get("model", 1) > 1
    if solver == "heun":
        dec_out = reverse_diffusion_heun(
            model, variables, z, y_mask, mu_y, n_timesteps, spk,
            sharded=seq_sharded, mesh=mesh if seq_sharded else None,
            pallas=pallas,
        )
    elif solver == "dpm":
        dec_out = reverse_diffusion_dpm2m(
            model, variables, z, y_mask, mu_y, n_timesteps, spk,
            sharded=seq_sharded, mesh=mesh if seq_sharded else None,
            pallas=pallas,
        )
    else:
        dec_out = reverse_diffusion(
            model, variables, z, y_mask, mu_y, n_timesteps, stoc, spk,
            rng_stoc, sharded=seq_sharded, mesh=mesh if seq_sharded else None,
            pallas=pallas,
        )
    return mu_y * y_mask, dec_out * y_mask, attn, y_lengths


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "n_timesteps", "max_frames", "stoc", "solver", "mesh",
        "pallas",
    ),
)
def synthesize(
    model,
    variables,
    rng,
    x,
    x_lengths,
    n_timesteps: int,
    max_frames: int,
    temperature: float = 1.0,
    stoc: bool = False,
    spk=None,
    length_scale: float = 1.0,
    x_durations: Optional[jnp.ndarray] = None,
    solver: str = "euler",
    mesh=None,
    pallas: Optional[bool] = None,
):
    """Text -> (encoder_outputs, decoder_outputs, attn, y_lengths).

    Mirrors tts.py:84-165 with static `max_frames`:
    encoder -> durations (or provided `x_durations`) -> path -> mu_y ->
    z ~ N(mu_y, I/temperature) -> reverse diffusion. Outputs are
    (B, max_frames, n_feats) with `y_lengths` marking valid frames.

    With `mesh` (a Mesh carrying a "model" axis), the diffusion loop runs
    sequence-parallel: the (B, T, C) state shards on T over "model"
    (SURVEY §5.7 long-context reservation, now real). GSPMD spatially
    partitions the U-Net convs (halo exchange over ICI) and inserts the
    gathers the full-T attention contractions need — same math, per-chip
    compute ~1/n_model for B=1 long utterances. `max_frames` must divide
    by the axis size (frame buckets are multiples of 128, so any 2^k axis
    does). The reference has no multi-device inference at all.
    """
    mu_x, logw, x_mask = model.apply(
        variables, x, x_lengths, spk, method="encode"
    )
    return synthesize_from_encoding(
        model,
        variables,
        rng,
        mu_x,
        logw,
        x_mask,
        n_timesteps=n_timesteps,
        max_frames=max_frames,
        temperature=temperature,
        stoc=stoc,
        spk=spk,
        length_scale=length_scale,
        x_durations=x_durations,
        solver=solver,
        mesh=mesh,
        pallas=pallas,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "vocoder", "n_timesteps", "max_frames", "stoc", "solver",
        "pallas",
    ),
)
def synthesize_to_wav(
    model,
    variables,
    vocoder,
    vocoder_variables,
    rng,
    x,
    x_lengths,
    n_timesteps: int,
    max_frames: int,
    temperature: float = 1.0,
    stoc: bool = False,
    spk=None,
    x_durations=None,
    solver: str = "euler",
    pallas: Optional[bool] = None,
):
    """End-to-end text -> waveform in ONE jitted program (acoustic sampler +
    vocoder). One device dispatch per utterance/batch — the full serving
    path. Returns (wav (B, max_frames*hop, 1), y_lengths).

    `pallas` (STATIC, default None = auto from backend + env kill
    switches) selects the fused-kernel vs XLA formulation for BOTH the
    U-Net body and the vocoder MRF stages. It must be a static jit arg —
    an env-var gate read at trace time does NOT invalidate jit caches, and
    two `jax.jit` wrappers of the same function share the C++ jit cache by
    function identity: the r5 bench's env-switched "fresh jit" XLA
    fallback was silently REUSED as the Pallas headline executable
    (126.6 ms vs the real 106.9) for two rounds of measurements."""
    enc, dec, attn, y_lengths = synthesize(
        model,
        variables,
        rng,
        x,
        x_lengths,
        n_timesteps=n_timesteps,
        max_frames=max_frames,
        temperature=temperature,
        stoc=stoc,
        spk=spk,
        x_durations=x_durations,
        solver=solver,
        pallas=pallas,
    )
    return _vocode(vocoder, vocoder_variables, dec, pallas), y_lengths


def _vocode(vocoder, vocoder_variables, dec, pallas: Optional[bool] = None):
    from arttts_tpu.models.hifigan import HiFiGANGenerator, hifigan_forward_fast
    from arttts_tpu.ops.mrf_pallas import mrf_runtime_enabled

    # On TPU, route the mel vocoder's MRF stages through the Pallas kernel
    # (ops/mrf_pallas.py): measured 17.7 -> 11.1 ms for the full generator
    # on v5e. CPU (tests, dryrun) keeps the module path — pallas needs
    # interpret mode there and output parity is pinned separately.
    # `pallas=False` forces the XLA path explicitly (a STATIC choice at the
    # jitted entry points); ARTTTS_DISABLE_MRF_PALLAS=1 flips the default.
    use_fast = mrf_runtime_enabled() if pallas is None else (
        pallas and jax.default_backend() != "cpu"
    )
    if isinstance(vocoder, HiFiGANGenerator) and use_fast:
        return hifigan_forward_fast(vocoder, vocoder_variables, dec)
    return vocoder.apply(vocoder_variables, dec)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "vocoder", "n_timesteps", "max_frames", "stoc", "solver",
        "pallas",
    ),
)
def synthesize_to_wav_from_encoding(
    model,
    variables,
    vocoder,
    vocoder_variables,
    rng,
    mu_x,
    logw,
    x_mask,
    n_timesteps: int,
    max_frames: int,
    temperature: float = 1.0,
    stoc: bool = False,
    spk=None,
    x_durations=None,
    solver: str = "euler",
    pallas: Optional[bool] = None,
):
    """Decode + vocode from precomputed encoder outputs, in one jitted
    program. With `encode_text` this is the two-dispatch serving path: a
    request runs encode (one dispatch), picks a static frame bucket from
    the returned predicted length host-side, then runs this program —
    the encoder is evaluated once per request instead of twice."""
    enc, dec, attn, y_lengths = synthesize_from_encoding(
        model,
        variables,
        rng,
        mu_x,
        logw,
        x_mask,
        n_timesteps=n_timesteps,
        max_frames=max_frames,
        temperature=temperature,
        stoc=stoc,
        spk=spk,
        x_durations=x_durations,
        solver=solver,
        pallas=pallas,
    )
    return _vocode(vocoder, vocoder_variables, dec, pallas), y_lengths


def serve_text_to_wav(
    model,
    variables,
    vocoder,
    vocoder_variables,
    rng,
    x,
    x_lengths,
    n_timesteps: int = 50,
    temperature: float = 1.0,
    spk=None,
    solver: str = "euler",
    max_frames_cap: int = 2048,
):
    """The real request path (ref `arttts_inference.py:317-348` chained into
    vocoding): encode once, pick the smallest static bucket holding the
    predicted duration, decode + vocode. Two device dispatches + one scalar
    fetch per request. Returns (wav, y_lengths, bucket)."""
    mu_x, logw, x_mask, pred = encode_text(model, variables, x, x_lengths, spk)
    pred_frames = int(np.ceil(float(jnp.max(pred))))
    bucket = frame_bucket(
        min(fix_len_compatibility(max(pred_frames, 4)), max_frames_cap)
    )
    wav, y_lengths = synthesize_to_wav_from_encoding(
        model, variables, vocoder, vocoder_variables, rng, mu_x, logw, x_mask,
        n_timesteps=n_timesteps, max_frames=bucket, temperature=temperature,
        spk=spk, solver=solver,
    )
    return wav, y_lengths, bucket


@functools.partial(jax.jit, static_argnames=("model",))
def predict_lengths(model, variables, x, x_lengths, spk=None):
    """Duration-only forward (tts.py:282-316): returns w = exp(logw) * mask.

    Jitted (model static): the serving path calls this per sentence to size
    the decoder bucket from the *actual* predicted length."""
    _, logw, x_mask = model.apply(variables, x, x_lengths, spk, method="encode")
    return jnp.exp(logw) * x_mask


def frame_bucket(predicted_frames: int, buckets=(128, 256, 384, 512, 768, 1024)) -> int:
    """Pick the smallest static bucket holding `predicted_frames` (U-Net
    compatible); falls back to rounding up to a multiple of 4."""
    for b in buckets:
        if predicted_frames <= b:
            return b
    return fix_len_compatibility(predicted_frames)
