"""Interactive demo server — the `UTMOS-demo/app.py` equivalent, without
gradio (not installable here): a stdlib ThreadingHTTPServer with

  GET  /          tiny HTML page (type text -> listen; upload wav -> MOS)
  POST /api/tts   JSON {"text": "...", "n_timesteps": 50, "solver": "euler"}
                  -> audio/wav (the two-dispatch serving path:
                  `infer/sampler.py:serve_text_to_wav`)
  POST /api/mos   raw wav body -> JSON {"mos": float}
                  (ref `UTMOS-demo/app.py:24-38`: resample to 16 kHz,
                  wav2vec2+BiLSTM heads, frame-mean * 2 + 3)

    python -m arttts_tpu.cli.demo --preset v2 --ckpt logs/v2/grad_best \
        --vocoder-ckpt ckpts/hifigan.pt --utmos-ckpt ckpts/utmos.ckpt

Without checkpoints the models run on random init (loudly warned — the
audio is noise, but the full serving path is exercised end to end).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger(__name__)

_PAGE = """<!doctype html>
<title>arttts-tpu demo</title>
<h1>arttts-tpu</h1>
<h2>Text to speech</h2>
<form onsubmit="tts(event)"><input id=t size=60 value="Hello world.">
<button>Synthesize</button></form><audio id=a controls></audio>
<h2>MOS scoring (UTMOS)</h2>
<input type=file id=f accept=.wav onchange="mos()"><pre id=m></pre>
<script>
async function tts(e){e.preventDefault();
 const r=await fetch('/api/tts',{method:'POST',
  body:JSON.stringify({text:document.getElementById('t').value})});
 document.getElementById('a').src=URL.createObjectURL(await r.blob());}
async function mos(){const f=document.getElementById('f').files[0];
 const r=await fetch('/api/mos',{method:'POST',body:await f.arrayBuffer()});
 document.getElementById('m').textContent=await r.text();}
</script>"""


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """Mono 16-bit PCM WAV in memory (scipy-free: the demo must not touch
    the filesystem per request)."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
    hdr += struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def _parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal RIFF reader for the /api/mos body (16-bit/float PCM mono or
    first channel)."""
    from scipy.io import wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    wav = np.asarray(wav)
    if wav.ndim > 1:
        wav = wav[:, 0]
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483648.0
    else:
        wav = wav.astype(np.float32)
    return wav, int(sr)


class DemoApp:
    """Holds the compiled serving state shared by all request threads.
    Device work is serialized with a lock (one chip, one queue)."""

    def __init__(self, preset: str = "v2", ckpt=None, vocoder_ckpt=None,
                 utmos_ckpt=None, sample_rate: int = 22050,
                 vocoder=None, voc_vars=None, scorer=None,
                 max_frames_cap: int = 2048):
        import jax
        import jax.numpy as jnp

        from arttts_tpu.core.config import get_preset
        from arttts_tpu.models.hifigan import HiFiGANGenerator
        from arttts_tpu.models.tts import GradTTSModel

        self.sample_rate = sample_rate
        self.max_frames_cap = max_frames_cap
        self.cfg = get_preset(preset)
        if self.cfg.model.n_feats != 80:
            raise ValueError("the TTS demo serves mel presets (n_feats=80)")
        self.model = GradTTSModel(config=self.cfg.model)
        self._lock = threading.Lock()

        key = jax.random.PRNGKey(0)
        if ckpt:
            from arttts_tpu.core.checkpoint import load_checkpoint

            self.variables = {"params": load_checkpoint(ckpt)["params"]}
        else:
            log.warning("demo: RANDOM acoustic weights (no --ckpt) — the "
                        "audio will be noise")
            x0 = jnp.zeros((1, 8), jnp.int32)
            self.variables = jax.jit(self.model.init)(
                {"params": key, "dropout": key}, x0,
                jnp.array([8], jnp.int32),
                jnp.zeros((1, 64, self.cfg.model.n_feats)),
                jnp.ones((1, 64, 1)), jnp.zeros((1,)),
            )

        self.vocoder = vocoder or HiFiGANGenerator()
        if voc_vars is not None:
            self.voc_vars = voc_vars
        elif vocoder_ckpt:
            import torch

            from arttts_tpu.utils.torch_convert import (
                convert_hifigan_generator,
            )

            t_ckpt = torch.load(
                vocoder_ckpt, map_location="cpu", weights_only=False
            )
            sd = t_ckpt.get("generator", t_ckpt)
            self.voc_vars = {"params": convert_hifigan_generator(sd)}
        else:
            log.warning("demo: RANDOM vocoder weights (no --vocoder-ckpt)")
            self.voc_vars = jax.jit(self.vocoder.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, 256, 80), jnp.float32)
            )

        from arttts_tpu.eval.utmos_scorer import UTMOSScorer

        if scorer is not None:
            self.scorer = scorer
        elif utmos_ckpt:
            self.scorer = UTMOSScorer.from_lightning_checkpoint(utmos_ckpt)
        else:
            log.warning("demo: RANDOM UTMOS weights (no --utmos-ckpt)")
            from arttts_tpu.models.utmos import UTMOSPredictor

            um = UTMOSPredictor()
            uv = jax.jit(um.init)(
                jax.random.PRNGKey(2), jnp.zeros((1, 16000), jnp.float32),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            )
            self.scorer = UTMOSScorer(um, uv)

        from arttts_tpu.core.paths import CMUDICT_PATH
        from arttts_tpu.text.cmudict import CMUDict

        try:
            self.cmudict = CMUDict(str(CMUDICT_PATH))
        except Exception:
            self.cmudict = None

    # ---- endpoints -----------------------------------------------------
    def tts(self, text: str, n_timesteps: int = 50,
            solver: str = "euler") -> bytes:
        import jax

        from arttts_tpu.infer.sampler import serve_text_to_wav
        from arttts_tpu.text.sequence import intersperse, text_to_sequence
        from arttts_tpu.text.symbols import symbols

        import jax.numpy as jnp

        seq = intersperse(
            text_to_sequence(text, dictionary=self.cmudict), len(symbols)
        )
        x = jnp.asarray(np.asarray(seq, np.int32)[None])
        xl = jnp.array([len(seq)], jnp.int32)
        with self._lock:
            wav, y_len, _bucket = serve_text_to_wav(
                self.model, self.variables, self.vocoder, self.voc_vars,
                jax.random.PRNGKey(np.random.randint(1 << 31)), x, xl,
                n_timesteps=n_timesteps, solver=solver,
                max_frames_cap=self.max_frames_cap,
            )
            frames = int(np.asarray(y_len)[0])
            audio = np.asarray(wav)[0, : frames * 256, 0]
        return _wav_bytes(audio, self.sample_rate)

    def mos(self, wav_body: bytes) -> float:
        from arttts_tpu.eval.utmos_scorer import _bucket, repeat_pad

        wav, sr = _parse_wav(wav_body)
        if sr != 16000:
            from scipy.signal import resample_poly

            g = int(np.gcd(sr, 16000))
            wav = resample_poly(wav, 16000 // g, sr // g).astype(np.float32)
        wav = repeat_pad(wav, _bucket(len(wav)))
        with self._lock:
            return float(self.scorer.score_batch([wav])[0])


def make_handler(app: DemoApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.info("demo: " + fmt, *args)

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            try:
                if self.path == "/api/tts":
                    req = json.loads(body or b"{}")
                    wav = app.tts(
                        req.get("text", ""),
                        n_timesteps=int(req.get("n_timesteps", 50)),
                        solver=req.get("solver", "euler"),
                    )
                    self._send(200, wav, "audio/wav")
                elif self.path == "/api/mos":
                    mos = app.mos(body)
                    self._send(
                        200, json.dumps({"mos": mos}).encode(),
                        "application/json",
                    )
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # demo: report, never crash the server
                log.exception("demo request failed")
                self._send(
                    500, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )

    return Handler


def serve(app: DemoApp, host: str = "127.0.0.1", port: int = 7860):
    """Build the server (gradio's default port, for familiarity). Returns
    the ThreadingHTTPServer; caller runs serve_forever()."""
    return ThreadingHTTPServer((host, port), make_handler(app))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="v2")
    parser.add_argument("--ckpt")
    parser.add_argument("--vocoder-ckpt")
    parser.add_argument("--utmos-ckpt")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from arttts_tpu.core.runtime import setup_runtime

    setup_runtime()
    app = DemoApp(args.preset, args.ckpt, args.vocoder_ckpt, args.utmos_ckpt)
    srv = serve(app, args.host, args.port)
    log.info("demo listening on http://%s:%d", args.host, args.port)
    srv.serve_forever()


if __name__ == "__main__":
    main()
