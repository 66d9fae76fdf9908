"""VoxCommunis subsystem tests: decoder bijection, tokenizer encoding,
samplers, manifest IO, ms dataset + GradTTArtic training step."""

import numpy as np
import pytest

from arttts_tpu.voxcommunis.data import (
    FeatureTokenizer,
    PanPhonInventory,
    phonological_feature_rows,
)
from arttts_tpu.voxcommunis.decoder import SILENCE, FeatureDecoder
from arttts_tpu.voxcommunis.io import read_alignment, read_manifest, write_manifest
from arttts_tpu.voxcommunis.sampler import (
    LengthGroupedLanguageUpSampler,
    LengthGroupedSampler,
    get_length_grouped_indices,
)
from arttts_tpu.voxcommunis.utils import unique_consecutive


@pytest.fixture(scope="module")
def decoder():
    return FeatureDecoder(sum_diphthong=True)


@pytest.fixture(scope="module")
def tokenizer(decoder):
    return FeatureTokenizer(decoder)


def test_unique_consecutive():
    u, c = unique_consecutive(["a", "a", "b", "b", "b", "a"], return_counts=True)
    assert u == ("a", "b", "a")
    assert c == (2, 3, 1)


def test_decoder_roundtrip(decoder):
    """feature vector -> find_segment recovers a segment with that vector."""
    for seg in ["a", "t", "ŋ", "ʃ"]:
        rep = decoder.segment_to_representative(seg)
        rep, feats = decoder.canonical_representation(rep)
        back = decoder.find_segment(tuple(int(v) for v in feats[0]))
        rep2, feats2 = decoder.canonical_representation(
            decoder.segment_to_representative(back)
        )
        np.testing.assert_array_equal(feats, feats2)


def test_decoder_silence(decoder):
    rep = decoder.segment_to_representative(SILENCE)
    _, feats = decoder.canonical_representation(rep)
    assert (feats == 0).all()
    assert decoder.find_segment((0,) * 24) == decoder.segments[decoder.zero_index]


def test_tokenizer_encode(tokenizer):
    feats, phones = tokenizer.encode(("a", "t"), (3, 2))
    assert feats.shape == (5, 24)
    assert phones[:3] == [phones[0]] * 3
    # diphthong spread over counts
    feats2, phones2 = tokenizer.encode(("aɪ",), (5,))
    assert feats2.shape[0] in (5,)  # sum_diphthong -> single merged vector


def test_phonological_feature_rows(tokenizer):
    rows = phonological_feature_rows("SIL SIL a a a t", tokenizer)
    assert rows.shape == (3, 26)
    # silence trait
    assert rows[0, 24] == 1 and rows[1, 24] == -1
    # counts channel
    np.testing.assert_array_equal(rows[:, 25], [2, 3, 1])


def test_panphon_inventory_subsample():
    inv = PanPhonInventory({"x!": "x"})
    out = inv.convert_to_ipa("a a b b c c x! x!")
    assert out == "a b c x"


def test_manifest_io(tmp_path, rng):
    from arttts_tpu.audio.io import save_wav

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(3):
        save_wav(d / f"s{i}.wav", rng.standard_normal(100 + i) * 0.1, 16000)
    write_manifest(d, tmp_path / "man.tsv")
    man = read_manifest(tmp_path / "man.tsv")
    assert len(man) == 3
    assert man["s1"][1] == 101

    (tmp_path / "a.align").write_text("s0\ta b c\ns1\td e\n")
    al = read_alignment(tmp_path / "a.align")
    assert al["s0"] == "a b c"


def test_length_grouped_sampler():
    lengths = list(range(100))
    s = LengthGroupedSampler(8, lengths, seed=0)
    idx = list(iter(s))
    assert sorted(idx) == list(range(100))
    # first batch contains the global max length
    assert max(lengths) in [lengths[i] for i in idx[:8]]


def test_language_upsampler():
    lengths = list(range(60))
    s = LengthGroupedLanguageUpSampler(
        4, lengths, lang_sizes=[50, 10], upsample_factor=0.5, seed=0
    )
    idx = np.array(list(iter(s)))
    assert len(idx) == 60
    # small language (indices 50..59) should be upsampled above its 1/6 share
    frac_small = (idx >= 50).mean()
    assert frac_small > 1 / 6


@pytest.mark.slow
def test_ms_dataset_and_grad_ttartic_step(tmp_path, rng, tokenizer):
    """Synthetic voxcommunis layout -> MsPhnmArticDataset -> one GradTTArtic
    training step."""
    import jax
    import jax.numpy as jnp

    from arttts_tpu.audio.io import save_wav
    from arttts_tpu.core.config import DecoderConfig, EncoderConfig, ModelConfig
    from arttts_tpu.data.batching import pad_batch
    from arttts_tpu.data.ms_datasets import MsPhnmArticDataset
    from arttts_tpu.models.tts import GradTTSModel
    from arttts_tpu.train.losses import grad_ttartic_loss

    lang = "ab"
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    enc_dir = tmp_path / "encoded_audio_multi" / lang
    (enc_dir / "emasrc").mkdir(parents=True)
    (enc_dir / "spk_preemb").mkdir(parents=True)
    align_lines = []
    for i in range(4):
        fid = f"cv_ab_{lang}_{i:04d}"
        save_wav(wavs / f"{fid}.wav", rng.standard_normal(1600) * 0.1, 16000)
        T = 40 + i
        np.save(enc_dir / "emasrc" / f"{fid}.npy", rng.standard_normal((T, 14)).astype(np.float32))
        np.save(enc_dir / "spk_preemb" / f"{fid}.npy", rng.standard_normal(1024).astype(np.float32))
        # alignment at 100 Hz: 2*T frames of phones
        phones = []
        for ph, reps in [("SIL", 20), ("a", 30), ("t", 20), ("a", 2 * T - 70)]:
            phones += [ph] * reps
        align_lines.append(f"{fid}\t{' '.join(phones)}")
    write_manifest(wavs, tmp_path / "man.tsv")
    (tmp_path / "align.align").write_text("\n".join(align_lines) + "\n")

    ds = MsPhnmArticDataset(
        tmp_path, tmp_path / "man.tsv", tmp_path / "align.align", tokenizer
    )
    assert len(ds) == 4
    item = ds[0]
    assert item["x"].shape[1] == 26
    assert item["y"].shape[1] == 16
    assert item["spk"].shape == (1024,)
    # durations sum to the 50 Hz frame count
    np.testing.assert_allclose(item["durations"].sum(), item["y"].shape[0], atol=1)

    batch = pad_batch([ds[i] for i in range(4)], min_frames=32)
    cfg = ModelConfig(
        name="grad_ttartic",
        n_feats=16,
        n_spks=2,
        encoder=EncoderConfig(
            kind="ipa_trait",
            n_input_feats=26,
            n_channels=16,
            filter_channels=32,
            filter_channels_dp=16,
            n_heads=1,
            n_layers=1,
        ),
        decoder=DecoderConfig(dim=8),
    )
    model = GradTTSModel(config=cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(batch["x"]),
        jnp.asarray(batch["x_lengths"]),
        jnp.asarray(batch["y"]),
        jnp.ones((4, batch["y"].shape[1], 1)),
        jnp.full((4,), 0.5),
        jnp.asarray(batch["spk"]),
    )
    total, parts = grad_ttartic_loss(
        model,
        variables,
        key,
        jnp.asarray(batch["x"]),
        jnp.asarray(batch["x_lengths"]),
        jnp.asarray(batch["y"]),
        jnp.asarray(batch["y_lengths"]),
        jnp.asarray(batch["spk"]),
        jnp.asarray(batch["durations"]),
        out_size=32,
    )
    assert np.isfinite(float(total))
    assert set(parts) == {"prior_loss", "diff_loss"}
