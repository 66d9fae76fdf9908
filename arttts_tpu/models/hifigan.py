"""HiFi-GAN vocoders: stock mel->wav and SPARC FiLM articulatory->wav.

Equivalents of the vendored jik876 generator
(`/root/reference/src/hifi-gan/models.py:147-210`) and the SPARC
speaker-conditioned generator (`model_ms/sparc_generator.py:19-316`,
`model_ms/sparc_block.py`). Feature-last layout `(B, T, C)`; transposed convs
use torch-exact semantics (`arttts_tpu/models/convs.py`) and torch-layout
weights so pretrained checkpoints (`hifigan.pt`, `sparc_*.ckpt`) convert
directly after weight-norm folding (`arttts_tpu/utils/torch_convert.py`).

On TPU the whole generator lowers to a chain of MXU conv ops; the MRF
resblock sum and LeakyReLUs fuse into them under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from arttts_tpu.models.convs import ConvTranspose1dTorch, conv_transpose_1d

LRELU_SLOPE = 0.1


def leaky_relu(x, slope=LRELU_SLOPE):
    return nn.leaky_relu(x, negative_slope=slope)


class SoftClamp(nn.Module):
    """tanh(x * temp) / temp (sparc_block.py:16-23)."""

    temp: float = 0.2

    def __call__(self, x):
        return jnp.tanh(x * self.temp) / self.temp


class ResBlock(nn.Module):
    """HiFi-GAN MRF residual block: per dilation, [leaky->dilated conv]
    (+ optional [leaky->conv d=1]) with residual adds
    (hifi-gan/models.py:13-101, sparc_block.py:26-107)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_additional_convs: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding="SAME",
                name=f"conv1_{i}",
            )(xt)
            if self.use_additional_convs:
                xt = leaky_relu(xt)
                xt = nn.Conv(
                    self.channels,
                    (self.kernel_size,),
                    padding="SAME",
                    name=f"conv2_{i}",
                )(xt)
            x = xt + x
        return x


class FiLMResBlock(nn.Module):
    """ResBlock where each dilation branch is FiLM-modulated by a speaker
    embedding: xt = xt * a + b with (a, b) from a SoftClamp'd MLP
    (sparc_block.py:110-205)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_additional_convs: bool = True
    spk_emb_size: int = 64
    film_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, spk_emb, deterministic: bool = True):
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x)
            xt = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding="SAME",
                name=f"conv1_{i}",
            )(xt)
            if self.use_additional_convs:
                xt = leaky_relu(xt)
                xt = nn.Conv(
                    self.channels,
                    (self.kernel_size,),
                    padding="SAME",
                    name=f"conv2_{i}",
                )(xt)
            film = nn.Dense(self.channels, name=f"film_{i}_0")(spk_emb)
            film = nn.relu(film)
            film = nn.Dropout(self.film_dropout, deterministic=deterministic)(film)
            film = nn.Dense(self.channels * 2, name=f"film_{i}_1")(film)
            film = SoftClamp()(film)
            a, b = film[:, : self.channels], film[:, self.channels :]
            xt = xt * a[:, None, :] + b[:, None, :]
            x = xt + x
        return x


class HiFiGANGenerator(nn.Module):
    """Stock mel->wav generator (hifi-gan/models.py:147-210).

    Defaults follow `src/checkpts/hifigan-config.json`: 80 mel in, 512
    initial channels, upsamples (8,8,2,2) with kernels (16,16,4,4),
    MRF kernels (3,7,11) x dilations (1,3,5).
    """

    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    use_additional_convs: bool = True  # ResBlock1

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, 80) -> wav (B, T * prod(rates), 1) in [-1, 1]."""
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME", name="conv_pre")(
            mel
        )
        num_kernels = len(self.resblock_kernel_sizes)
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            x = leaky_relu(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1dTorch(
                in_channels=self.upsample_initial_channel // (2**i),
                out_channels=ch,
                kernel_size=k,
                stride=u,
                padding=(k - u) // 2,
                name=f"ups_{i}",
            )(x)
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock(
                    channels=ch,
                    kernel_size=rk,
                    dilations=tuple(rd),
                    use_additional_convs=self.use_additional_convs,
                    name=f"resblock_{i}_{j}",
                )(x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
        x = nn.leaky_relu(x, negative_slope=0.01)  # torch LeakyReLU() default
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)


class SparcHiFiGANGenerator(nn.Module):
    """SPARC articulatory vocoder (sparc_generator.py:19-296): 14-ch input
    (12 EMA + pitch + loudness), pitch channel affine-rescaled
    `(f0 - 50) * 0.01`, FiLM residual blocks averaged per upsample level."""

    in_channels: int = 14
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    use_spk: bool = True
    spk_emb_size: int = 64
    use_tanh: bool = True
    pitch_offset: float = 50.0
    pitch_rescale: float = 0.01
    pitch_axis: int = 12

    @nn.compact
    def __call__(self, c, spk_emb: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """c: (B, T, in_channels) -> wav (B, T * prod(scales), 1)."""
        pitch = (c[..., self.pitch_axis] - self.pitch_offset) * self.pitch_rescale
        c = c.at[..., self.pitch_axis].set(pitch)

        x = nn.Conv(
            self.channels, (self.kernel_size,), padding="SAME", name="input_conv"
        )(c)
        num_blocks = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            x = leaky_relu(x)
            pad = u // 2 + u % 2
            outpad = u % 2
            ch = self.channels // (2 ** (i + 1))
            x = ConvTranspose1dTorch(
                in_channels=self.channels // (2**i),
                out_channels=ch,
                kernel_size=k,
                stride=u,
                padding=pad,
                output_padding=outpad,
                name=f"upsample_{i}",
            )(x)
            cs = 0.0
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                if self.use_spk:
                    cs = cs + FiLMResBlock(
                        channels=ch,
                        kernel_size=rk,
                        dilations=tuple(rd),
                        use_additional_convs=self.use_additional_convs,
                        spk_emb_size=self.spk_emb_size,
                        name=f"block_{i}_{j}",
                    )(x, spk_emb, deterministic=deterministic)
                else:
                    cs = cs + ResBlock(
                        channels=ch,
                        kernel_size=rk,
                        dilations=tuple(rd),
                        use_additional_convs=self.use_additional_convs,
                        name=f"block_{i}_{j}",
                    )(x)
            x = cs / num_blocks
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Conv(1, (self.kernel_size,), padding="SAME", name="output_conv")(x)
        return jnp.tanh(x) if self.use_tanh else x


class SpkSparcHiFiGANGenerator(nn.Module):
    """Speaker-encoder + generator in one checkpoint
    (sparc_generator.py:300-316)."""

    spk_ft_size: int = 1024
    spk_emb_size: int = 64
    generator: SparcHiFiGANGenerator = SparcHiFiGANGenerator()

    @nn.compact
    def __call__(self, c, spk_ft, deterministic: bool = True):
        h = nn.Dense(self.spk_ft_size, name="spk_enc_0")(spk_ft)
        h = nn.gelu(h, approximate=False)  # torch GELU is exact erf
        spk_emb = nn.Dense(self.spk_emb_size, name="spk_enc_1")(h)
        return self.generator(c, spk_emb, deterministic=deterministic)


# --------------------------------------------------------------------------
# GAN training parts (present-but-unused in the reference,
# hifi-gan/models.py:212-405) — kept for vocoder-training completeness.
# --------------------------------------------------------------------------
class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav into (T/p, p) and run 2D convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (logits, feature maps)."""
        B, T, _ = x.shape
        p = self.period
        pad = (p - T % p) % p
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(B, (T + pad) // p, p, 1)  # NHWC
        fmap = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.Conv(
                ch, (self.kernel_size, 1), strides=(self.stride, 1), padding="SAME"
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding="SAME")(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding="SAME")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator over (possibly average-pooled) waveforms."""

    @nn.compact
    def __call__(self, x):
        fmap = []
        specs = [
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for ch, k, s, g in specs:
            x = nn.Conv(ch, (k,), strides=(s,), padding="SAME", feature_group_count=g)(
                x
            )
            x = leaky_relu(x)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding="SAME")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        outs = []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_{p}")
            outs.append((d(y), d(y_hat)))
        y_d_rs = [o[0][0] for o in outs]
        y_d_gs = [o[1][0] for o in outs]
        fmap_rs = [o[0][1] for o in outs]
        fmap_gs = [o[1][1] for o in outs]
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, y, y_hat):
        outs = []
        for i in range(3):
            d = DiscriminatorS(name=f"disc_{i}")
            outs.append((d(y), d(y_hat)))
            # average-pool by 4 for the next scale
            y = nn.avg_pool(y, (4,), strides=(2,), padding="SAME")
            y_hat = nn.avg_pool(y_hat, (4,), strides=(2,), padding="SAME")
        y_d_rs = [o[0][0] for o in outs]
        y_d_gs = [o[1][0] for o in outs]
        fmap_rs = [o[0][1] for o in outs]
        fmap_gs = [o[1][1] for o in outs]
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for r, g in zip(dr, dg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        loss += jnp.mean((1 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def generator_loss(disc_outputs):
    loss = 0.0
    for dg in disc_outputs:
        loss += jnp.mean((1 - dg) ** 2)
    return loss


def hifigan_forward_fast(
    vocoder: "HiFiGANGenerator", variables, mel, interpret: bool = False
):
    """HiFiGANGenerator forward with the MRF stages on the Pallas kernel.

    A pure function over the SAME param tree as `vocoder.apply` (no module
    changes, converters untouched): conv_pre / upsample transposed convs /
    conv_post run through XLA; each upsample level's 3-branch MRF runs as
    one `ops/mrf_pallas.mrf_stage` kernel where supported (C <= 128 — the
    C=256 first stage keeps the XLA ResBlocks, see `mrf_supported`).
    Output parity with `vocoder.apply` is pinned by
    `tests/test_mrf_pallas.py::test_hifigan_forward_fast_matches_module`.
    """
    from jax import lax

    from arttts_tpu.ops.mrf_pallas import mrf_stage, mrf_supported, pack_mrf_weights

    p = variables["params"]

    def conv1d(x, pp):
        return (
            lax.conv_general_dilated(
                x, pp["kernel"], (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            + pp["bias"]
        )

    import arttts_tpu.ops.upsample_pallas as _ups
    from arttts_tpu.ops.upsample_pallas import upsample_packed

    x = conv1d(mel, p["conv_pre"])
    num_kernels = len(vocoder.resblock_kernel_sizes)
    rks = tuple(vocoder.resblock_kernel_sizes)
    dils = tuple(vocoder.resblock_dilation_sizes[0])
    uniform_dils = all(
        tuple(d) == dils for d in vocoder.resblock_dilation_sizes
    )
    mrf_ok = uniform_dils and vocoder.use_additional_convs
    ch = x.shape[-1]
    packed = False  # x is (B, rows, 128) with 128 // ch frames per row
    for i, (u, k) in enumerate(
        zip(vocoder.upsample_rates, vocoder.upsample_kernel_sizes)
    ):
        up = p[f"ups_{i}"]
        ch_out = up["weight"].shape[1]
        # stage-chained packed path: s=2 / k=4 upsamples between 128-lane
        # stages run lrelu+ConvT as one lane-packed kernel and feed the MRF
        # kernel without ever materializing an unpacked (lane-padded) tensor
        chain = (
            _ups.ENABLE_PACKED_CHAIN
            and u == 2 and k == 4 and ch <= 128 and 128 % ch == 0
            and ch_out * 2 == ch and mrf_ok and mrf_supported(ch_out, rks, dils)
        )
        if chain:
            if not packed:  # (B, T, 128) is already the r=1 packed form
                assert ch == 128, ch
            x = upsample_packed(
                x, up["weight"], up["bias"], u, (k - u) // 2,
                r_in=128 // ch, r_out=128 // ch_out, interpret=interpret,
            )
            packed = True
            ch = ch_out
            weights = pack_mrf_weights(
                [p[f"resblock_{i}_{j}"] for j in range(num_kernels)], ch
            )
            last = i == len(vocoder.upsample_rates) - 1
            x = mrf_stage(
                x, weights, rks, dils, interpret=interpret,
                channels=ch, packed_out=not last,
            )
            if last:
                packed = False
            continue
        if packed:  # unpack before a non-chained stage
            B_, rows_, _ = x.shape
            x = x.reshape(B_, rows_ * (128 // ch), ch)
            packed = False
        x = leaky_relu(x)
        x = conv_transpose_1d(x, up["weight"], u, (k - u) // 2) + up["bias"]
        ch = x.shape[-1]
        if mrf_ok and mrf_supported(ch, rks, dils):
            weights = pack_mrf_weights(
                [p[f"resblock_{i}_{j}"] for j in range(num_kernels)], ch
            )
            x = mrf_stage(x, weights, rks, dils, interpret=interpret)
        else:
            xs = None
            for j, (rk, rd) in enumerate(
                zip(vocoder.resblock_kernel_sizes, vocoder.resblock_dilation_sizes)
            ):
                r = ResBlock(
                    channels=ch,
                    kernel_size=rk,
                    dilations=tuple(rd),
                    use_additional_convs=vocoder.use_additional_convs,
                ).apply({"params": p[f"resblock_{i}_{j}"]}, x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
    x = nn.leaky_relu(x, negative_slope=0.01)
    x = conv1d(x, p["conv_post"])
    return jnp.tanh(x)


def sparc_forward_fast(
    generator: "SparcHiFiGANGenerator", variables, c, spk_emb,
    interpret: bool = False,
):
    """SparcHiFiGANGenerator forward with the FiLM-MRF stages on the Pallas
    kernel (`ops/mrf_pallas.mrf_stage(film=...)`) — same param tree as
    `.apply`, inference-only (FiLM dropout deterministic). The per-utterance
    FiLM (a, b) vectors are tiny MLP outputs computed here and passed into
    the kernel; stages whose channel count the kernel does not support fall
    back to the XLA FiLMResBlock path."""
    import jax
    from jax import lax

    from arttts_tpu.ops.mrf_pallas import mrf_stage, mrf_supported, pack_mrf_weights

    g = generator
    p = variables["params"]

    def conv1d(x, pp):
        return (
            lax.conv_general_dilated(
                x, pp["kernel"], (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            + pp["bias"]
        )

    import arttts_tpu.ops.upsample_pallas as _ups
    from arttts_tpu.ops.upsample_pallas import upsample_packed

    pitch = (c[..., g.pitch_axis] - g.pitch_offset) * g.pitch_rescale
    c = c.at[..., g.pitch_axis].set(pitch)
    x = conv1d(c, p["input_conv"])
    num_blocks = len(g.resblock_kernel_sizes)
    rks = tuple(g.resblock_kernel_sizes)
    dils = tuple(g.resblock_dilations[0])
    uniform = all(tuple(d) == dils for d in g.resblock_dilations)

    def film_vectors(bp, n_dil, C):
        """block params -> (a, b) each (n_dil, B, C) from the film MLPs."""
        a_list, b_list = [], []
        for d in range(n_dil):
            h = spk_emb @ bp[f"film_{d}_0"]["kernel"] + bp[f"film_{d}_0"]["bias"]
            h = jax.nn.relu(h)
            f = h @ bp[f"film_{d}_1"]["kernel"] + bp[f"film_{d}_1"]["bias"]
            f = jnp.tanh(f * 0.2) / 0.2  # SoftClamp
            a_list.append(f[:, :C])
            b_list.append(f[:, C:])
        return jnp.stack(a_list), jnp.stack(b_list)

    ch = x.shape[-1]
    packed = False  # x is (B, rows, 128) with 128 // ch frames per row
    for i, (u, k) in enumerate(zip(g.upsample_scales, g.upsample_kernel_sizes)):
        up = p[f"upsample_{i}"]
        ch_out = up["weight"].shape[1]
        mrf_ok = g.use_spk and uniform and g.use_additional_convs
        # stage-chained packed path, same as hifigan_forward_fast: the s=2
        # upsamples between 128-lane stages stay in the packed layout
        # (SPARC pad u//2 + u%2 == 1 == the mel path's (k-u)//2 for u=2/k=4)
        chain = (
            _ups.ENABLE_PACKED_CHAIN
            and u == 2 and k == 4 and ch <= 128 and 128 % ch == 0
            and ch_out * 2 == ch and mrf_ok and mrf_supported(ch_out, rks, dils)
        )
        if chain:
            if not packed:
                assert ch == 128, ch
            x = upsample_packed(
                x, up["weight"], up["bias"], u, u // 2 + u % 2,
                r_in=128 // ch, r_out=128 // ch_out, interpret=interpret,
            )
            packed = True
            ch = ch_out
            block_ps = [p[f"block_{i}_{j}"] for j in range(num_blocks)]
            weights = pack_mrf_weights(block_ps, ch)
            films = [film_vectors(bp, len(dils), ch) for bp in block_ps]
            fa = jnp.stack([f[0] for f in films])
            fb = jnp.stack([f[1] for f in films])
            last = i == len(g.upsample_scales) - 1
            x = mrf_stage(
                x, weights, rks, dils, interpret=interpret, film=(fa, fb),
                channels=ch, packed_out=not last,
            )
            if last:
                packed = False
            continue
        if packed:  # unpack before a non-chained stage
            B_, rows_, _ = x.shape
            x = x.reshape(B_, rows_ * (128 // ch), ch)
            packed = False
        x = leaky_relu(x)
        x = conv_transpose_1d(
            x, up["weight"], u, u // 2 + u % 2, output_padding=u % 2
        ) + up["bias"]
        ch = x.shape[-1]
        if mrf_ok and mrf_supported(ch, rks, dils):
            block_ps = [p[f"block_{i}_{j}"] for j in range(num_blocks)]
            weights = pack_mrf_weights(block_ps, ch)
            films = [film_vectors(bp, len(dils), ch) for bp in block_ps]
            fa = jnp.stack([f[0] for f in films])
            fb = jnp.stack([f[1] for f in films])
            x = mrf_stage(x, weights, rks, dils, interpret=interpret,
                          film=(fa, fb))
        else:
            cs = 0.0
            for j, (rk, rd) in enumerate(
                zip(g.resblock_kernel_sizes, g.resblock_dilations)
            ):
                if g.use_spk:
                    r = FiLMResBlock(
                        channels=ch, kernel_size=rk, dilations=tuple(rd),
                        use_additional_convs=g.use_additional_convs,
                        spk_emb_size=g.spk_emb_size,
                    ).apply({"params": p[f"block_{i}_{j}"]}, x, spk_emb,
                            deterministic=True)
                else:
                    r = ResBlock(
                        channels=ch, kernel_size=rk, dilations=tuple(rd),
                        use_additional_convs=g.use_additional_convs,
                    ).apply({"params": p[f"block_{i}_{j}"]}, x)
                cs = cs + r
            x = cs / num_blocks
    x = nn.leaky_relu(x, negative_slope=0.01)
    x = conv1d(x, p["output_conv"])
    return jnp.tanh(x) if g.use_tanh else x


def spk_sparc_forward_fast(
    module: "SpkSparcHiFiGANGenerator", variables, c, spk_ft,
    interpret: bool = False,
):
    """SpkSparcHiFiGANGenerator fast path: speaker MLP + Pallas generator."""
    p = variables["params"]
    h = spk_ft @ p["spk_enc_0"]["kernel"] + p["spk_enc_0"]["bias"]
    h = nn.gelu(h, approximate=False)
    spk_emb = h @ p["spk_enc_1"]["kernel"] + p["spk_enc_1"]["bias"]
    return sparc_forward_fast(
        module.generator, {"params": p["generator"]}, c, spk_emb,
        interpret=interpret,
    )
