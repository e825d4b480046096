"""Dependency-free web demo: lyrics + MIDI notes -> wav in the browser.

Capability parity with the reference's gradio demo
(inference/svs/gradio/infer.py:25-90) — same three text inputs, same
sentence-split batching and int16 concatenation (shared via
``gradio_app.GradioInfer.greet``) — but served by the Python stdlib
``http.server`` instead of gradio, which is not installed in this image and
cannot be (no package installs / zero egress). If gradio ever becomes
available, ``gradio_app.GradioInfer.run`` is the drop-in UI; this module is
the production-lean equivalent that works everywhere.

Endpoints:
  GET  /                 HTML form (text / notes / note durations)
  POST /api/synthesize   JSON {"text","notes","notes_duration"} -> audio/wav

Run: ``python -m diffsinger_tpu.inference.web_app --config ... --port 7860``.
"""

from __future__ import annotations

import io
import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Tuple

import numpy as np

# POST bodies are lyric + MIDI JSON — reject anything bigger (advisor r3)
MAX_REQUEST_BYTES = 1 << 20

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{font-family:sans-serif;max-width:48rem;margin:2rem auto}}
textarea{{width:100%;height:4rem}}</style></head>
<body><h1>{title}</h1><p>{description}</p>
<form id="f">
<label>Input Text<textarea name="text"></textarea></label>
<label>Input Note<textarea name="notes"></textarea></label>
<label>Input Duration<textarea name="notes_duration"></textarea></label>
<button type="submit">Synthesize</button></form>
<audio id="out" controls></audio>
<script>
f.onsubmit = async (e) => {{
  e.preventDefault();
  const body = JSON.stringify(Object.fromEntries(new FormData(f)));
  const r = await fetch('/api/synthesize', {{method: 'POST', body}});
  if (!r.ok) {{ alert(await r.text()); return; }}
  out.src = URL.createObjectURL(await r.blob());
  out.play();
}};
</script></body></html>
"""


def wav_bytes(wav_int16: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE PCM16 encoding of a mono int16 waveform (no scipy needed)."""
    data = np.asarray(wav_int16, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data))
    return hdr + data


class SVSWebApp:
    """Wraps a ``GradioInfer`` core (the sentence-split synthesis logic) in a
    stdlib HTTP server. ``core`` needs only ``.greet(text, notes, durs) ->
    (sr, int16 wav)`` plus ``.title``/``.description``, so tests can inject a
    stub without building a model."""

    def __init__(self, core):
        self.core = core
        self._httpd = None

    # ------------------------------------------------------------ handlers
    def _page(self) -> bytes:
        return _PAGE.format(title=self.core.title,
                            description=self.core.description).encode()

    def _synthesize(self, payload: Dict[str, str]) -> Tuple[int, bytes]:
        sr, wav = self.core.greet(payload.get("text", ""),
                                  payload.get("notes", ""),
                                  payload.get("notes_duration", ""))
        return sr, wav_bytes(wav, sr)

    def _make_handler(self):
        app = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _send(self, code: int, ctype: str, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(200, "text/html; charset=utf-8", app._page())
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                if self.path != "/api/synthesize":
                    self._send(404, "text/plain", b"not found")
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self._send(400, "text/plain", b"bad Content-Length")
                    return
                if n < 0:  # rfile.read(-1) would block until client EOF
                    self._send(400, "text/plain", b"bad Content-Length")
                    return
                if n > MAX_REQUEST_BYTES:  # lyric/MIDI payloads are tiny
                    self._send(413, "text/plain", b"request body too large")
                    return
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    _, body = app._synthesize(payload)
                except Exception as e:  # surface synthesis errors to the UI
                    self._send(400, "text/plain", str(e).encode())
                    return
                self._send(200, "audio/wav", body)

        return Handler

    # ------------------------------------------------------------- serving
    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def run_forever(self, host: str = "127.0.0.1", port: int = 7860):
        """Blocking serve. Defaults to loopback; pass --host 0.0.0.0 to expose
        on the network (the app has no auth — opt in deliberately)."""
        httpd = ThreadingHTTPServer((host, port), self._make_handler())
        print(f"| serving on http://{host}:{port}", flush=True)
        httpd.serve_forever()


def main(argv=None):
    import argparse

    from diffsinger_tpu.config.hparams import set_hparams
    from diffsinger_tpu.inference.gradio_app import GradioInfer
    from diffsinger_tpu.inference.svs import DiffSingerE2EInfer

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--exp_name", default="")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)
    hp = set_hparams(config=args.config, exp_name=args.exp_name)
    core = GradioInfer(hp, DiffSingerE2EInfer, title="DiffSinger-TPU",
                       description="lyrics + MIDI notes -> singing voice")
    SVSWebApp(core).run_forever(args.host, args.port)


if __name__ == "__main__":
    main()
