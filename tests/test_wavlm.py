"""WavLM golden tests vs `transformers.WavLMModel` (random weights).

The native WavLM (`arttts_tpu/models/wavlm.py`) backs the framework's SPARC
articulatory encoder; both encoder variants (pre-LN "stable" = Large,
post-LN = Base) are verified output-exact after conversion, plus the
early-exit `tap_layer` path against HF's `hidden_states`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from arttts_tpu.models.wavlm import WavLMConfig, WavLMEncoder
from arttts_tpu.utils.torch_convert_wavlm import convert_wavlm


def _hf_config(cfg: WavLMConfig):
    from transformers import WavLMConfig as HFWavLMConfig

    return HFWavLMConfig(
        vocab_size=32,
        hidden_size=cfg.hidden_dim,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_dim,
        conv_dim=[c[0] for c in cfg.conv_layers],
        conv_kernel=[c[1] for c in cfg.conv_layers],
        conv_stride=[c[2] for c in cfg.conv_layers],
        num_feat_extract_layers=len(cfg.conv_layers),
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        num_buckets=cfg.num_buckets,
        max_bucket_distance=cfg.max_distance,
        feat_extract_norm=cfg.conv_norm,
        conv_bias=cfg.conv_bias,
        do_stable_layer_norm=cfg.stable_layer_norm,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


SMALL_LARGE_STYLE = WavLMConfig(
    conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    hidden_dim=32,
    num_layers=3,
    num_heads=4,
    ffn_dim=64,
    num_buckets=32,
    max_distance=40,
    pos_conv_kernel=16,
    pos_conv_groups=2,
    stable_layer_norm=True,
    conv_norm="layer",
    conv_bias=True,
)

SMALL_BASE_STYLE = WavLMConfig(
    conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    hidden_dim=32,
    num_layers=3,
    num_heads=4,
    ffn_dim=64,
    num_buckets=32,
    max_distance=40,
    pos_conv_kernel=16,
    pos_conv_groups=2,
    stable_layer_norm=False,
    conv_norm="group",
    conv_bias=False,
)


@pytest.mark.parametrize("cfg", [SMALL_LARGE_STYLE, SMALL_BASE_STYLE],
                         ids=["stable_ln", "post_ln"])
def test_wavlm_matches_transformers(rng, cfg):
    from transformers import WavLMModel

    torch.manual_seed(0)
    hf = WavLMModel(_hf_config(cfg)).eval()
    wav = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

    params = convert_wavlm(hf.state_dict(), cfg)
    model = WavLMEncoder(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_wavlm_tap_layer_matches_hidden_states(rng):
    from transformers import WavLMModel

    cfg = SMALL_LARGE_STYLE
    torch.manual_seed(1)
    hf = WavLMModel(_hf_config(cfg)).eval()
    wav = rng.standard_normal((1, 800)).astype(np.float32)
    with torch.no_grad():
        hidden = hf(torch.from_numpy(wav), output_hidden_states=True).hidden_states

    params = convert_wavlm(hf.state_dict(), cfg)
    model = WavLMEncoder(cfg)
    for tap in (1, 2):
        got = np.asarray(
            model.apply({"params": params}, jnp.asarray(wav), tap_layer=tap)
        )
        np.testing.assert_allclose(got, hidden[tap].numpy(), atol=3e-5)


def test_wavlm_padded_batch_matches_unpadded(rng):
    """Padded, masked batching must equal per-utterance forwards on the
    valid frames (serving uses bucketed static shapes)."""
    cfg = SMALL_LARGE_STYLE
    model = WavLMEncoder(cfg)
    wav_a = rng.standard_normal((1, 800)).astype(np.float32)
    n_a = model.num_frames(800)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(wav_a))

    solo = model.apply(variables, jnp.asarray(wav_a))
    wav_pad = np.concatenate([wav_a, np.zeros((1, 400), np.float32)], axis=1)
    n_tot = model.num_frames(1200)
    mask = (np.arange(n_tot) < n_a).astype(np.float32)[None, :]
    padded = model.apply(
        variables, jnp.asarray(wav_pad), frame_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(padded)[:, :n_a], np.asarray(solo), atol=2e-4
    )


@pytest.mark.slow
def test_wavlm_base_size_roundtrip(rng):
    """Full WavLM-Base-sized conversion round trip (12 layers, 768 dim) —
    closes the reduced-config-only risk for the real checkpoint shapes."""
    from transformers import WavLMModel

    cfg = WavLMConfig.base()
    torch.manual_seed(2)
    hf = WavLMModel(_hf_config(cfg)).eval()
    wav = rng.standard_normal((1, 3200)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    params = convert_wavlm(hf.state_dict(), cfg)
    got = np.asarray(WavLMEncoder(cfg).apply({"params": params}, jnp.asarray(wav)))
    np.testing.assert_allclose(got, want, atol=2e-4)
