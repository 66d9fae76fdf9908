"""Demo server (`cli/demo.py`, the UTMOS-demo/app.py equivalent): end-to-end
HTTP round trips against a live ThreadingHTTPServer on tiny models —
GET / page, POST /api/tts -> playable WAV, POST /api/mos -> JSON score."""

import http.client
import io
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arttts_tpu.core.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    register_preset,
)


class _FakeScorer:
    """MOS protocol stand-in: deterministic function of the wav energy so
    the HTTP plumbing (parse, resample, bucket) is what's under test."""

    def score_batch(self, wavs):
        return np.asarray([3.0 + float(np.mean(np.abs(w))) for w in wavs])


@pytest.fixture(scope="module")
def demo_app():
    cfg = ExperimentConfig(
        "tiny_demo",
        ModelConfig(
            name="grad_tts",
            n_feats=80,
            encoder=EncoderConfig(
                kind="text", n_vocab=149, n_channels=16, filter_channels=32,
                filter_channels_dp=16, n_heads=2, n_layers=1,
            ),
            decoder=DecoderConfig(dim=8),
        ),
        DataConfig(dataset="text_mel"),
        TrainConfig(),
    )
    register_preset(cfg)

    from arttts_tpu.cli.demo import DemoApp
    from arttts_tpu.models.hifigan import HiFiGANGenerator

    voc = HiFiGANGenerator(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    voc_vars = voc.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 80), jnp.float32)
    )
    return DemoApp(
        "tiny_demo", vocoder=voc, voc_vars=voc_vars, scorer=_FakeScorer(),
        max_frames_cap=128,
    )


@pytest.fixture(scope="module")
def server(demo_app):
    from arttts_tpu.cli.demo import serve

    srv = serve(demo_app, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _conn(addr):
    return http.client.HTTPConnection(addr[0], addr[1], timeout=600)


def test_index_page(server):
    c = _conn(server)
    c.request("GET", "/")
    r = c.getresponse()
    assert r.status == 200
    assert b"arttts-tpu" in r.read()


def test_tts_roundtrip(server):
    c = _conn(server)
    c.request(
        "POST", "/api/tts",
        body=json.dumps({"text": "Hello world.", "n_timesteps": 2}),
    )
    r = c.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    body = r.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    # decodable by the same reader the /api/mos endpoint uses
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(body))
    assert sr == 22050
    assert wav.ndim == 1 and len(wav) > 0
    assert len(wav) % 256 == 0  # whole frames


def test_mos_roundtrip(server):
    from arttts_tpu.cli.demo import _wav_bytes

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(22050) * 0.05).astype(np.float32)
    body = _wav_bytes(wav, 22050)  # 22.05 kHz: exercises the resample
    c = _conn(server)
    c.request("POST", "/api/mos", body=body)
    r = c.getresponse()
    assert r.status == 200
    mos = json.loads(r.read())["mos"]
    assert 2.9 < mos < 3.2


def test_bad_route(server):
    c = _conn(server)
    c.request("POST", "/api/nope", body=b"")
    assert c.getresponse().status == 404
