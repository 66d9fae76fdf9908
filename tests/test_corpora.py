"""Corpus adapter tests on synthetic label/EMA files."""

import numpy as np
import pytest

from arttts_tpu.corpora.readers import (
    get_mocha_ema,
    get_mocha_phnm3,
    get_mngu0_phnm3,
    get_mspka_phnm3,
    get_pb2007_ema,
    get_pb2007_phnm3,
)
from arttts_tpu.text.phnms import (
    build_phnm3,
    get_lengths_from_phnm3,
    get_phnms_from_phnm3,
    get_pred_phnm3,
)


def test_build_phnm3_and_lengths():
    p = build_phnm3(["h", "ə", "aɪ"], [0.0, 0.1, 0.2, 0.4])
    assert p.shape == (3,)
    assert p[2]["phone"] == "aɪ"
    # diphthong split halves its duration
    d = get_lengths_from_phnm3(p, merge_diphtongues=False)
    np.testing.assert_allclose(d, [0.1, 0.1, 0.1, 0.1], atol=1e-6)
    d2 = get_lengths_from_phnm3(p, merge_diphtongues=True)
    np.testing.assert_allclose(d2, [0.1, 0.1, 0.2], atol=1e-6)
    assert get_phnms_from_phnm3(p, False) == ["h", "ə", "a", "ɪ"]


def test_get_pred_phnm3():
    p = build_phnm3(["a", "b"], [0.0, 0.1, 0.2])
    phnm_map = np.array([0, 0, 0, 1, 1])  # 5 frames at 50 Hz
    ada = get_pred_phnm3(p, phnm_map, merge_diphtongues=True)
    assert len(ada) == 2
    np.testing.assert_allclose(ada["end"][-1], 5 / 50)
    np.testing.assert_allclose(ada["end"][0], 3 / 50)


def test_mngu0_lab(tmp_path):
    lab = tmp_path / "a.lab"
    lab.write_text("header\n#\n0.25 26 p\n0.5 26 aI\n0.9 26 #\n")
    p = get_mngu0_phnm3(lab)
    assert [str(x) for x in p["phone"]] == ["p", "aɪ", "."]
    np.testing.assert_allclose(p["end"], [0.25, 0.5, 0.9])


def test_mocha_phnm_and_ema(tmp_path):
    f = tmp_path / "a.phnm"
    f.write_text("0.0 0.1 sil\n0.1 0.3 ɝ\n")
    p = get_mocha_phnm3(f)
    assert str(p[0]["phone"]) == "." and str(p[1]["phone"]) == "ɜ˞"

    ema_fp = tmp_path / "a.ema"
    frames = np.arange(3 * 22, dtype=np.float32).reshape(3, 22)
    with open(ema_fp, "wb") as fo:
        fo.write(b"EST_File Track\nEST_Header_End\n")
        frames.tofile(fo)
    ema = get_mocha_ema(ema_fp)
    assert ema.shape == (3, 12)


def test_mspka_lab(tmp_path):
    f = tmp_path / "a.lab"
    f.write_bytes("0.0 0.2 sil\n0.2 0.4 tS ciao\n0.4 0.6 nf\n".encode())
    p = get_mspka_phnm3(f)
    phones = [str(x) for x in p["phone"]]
    assert phones == [".", "t͡ʃ", "n", "f"]  # nf split in two
    np.testing.assert_allclose(p["end"][2], 0.5)


def test_pb2007(tmp_path):
    f = tmp_path / "a.phone"
    f.write_text("0 10 __\n10 30 a\n30 50 s^\n")
    p = get_pb2007_phnm3(f)
    assert [str(x) for x in p["phone"]] == [".", "a", "ʃ"]
    np.testing.assert_allclose(p["end"], [0.1, 0.3, 0.5])

    ema_fp = tmp_path / "a.bin"
    np.arange(24, dtype=np.float32).tofile(ema_fp)
    ema = get_pb2007_ema(ema_fp)
    assert ema.shape == (2, 12)


def test_corpus_layouts(tmp_path):
    from arttts_tpu.corpora.configs import CORPUS_LAYOUTS, load_corpus_config

    lay = CORPUS_LAYOUTS["mspka"]
    assert lay.ema_sr == 400
    assert str(lay.audio_dir("/d", "spk1")).endswith("spk1_1.0.0/wav_1.0.0")
    assert lay.expand(lay.filestem, "spk1", "0042") == "spk1_0042"

    yml = tmp_path / "c.yaml"
    yml.write_text("audio_sr: 16000\nema_sr: 250\nfilestem: item_id#\n")
    c = load_corpus_config(yml)
    assert c.ema_sr == 250 and c.name == "c"
