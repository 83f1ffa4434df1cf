"""Load generator for the online serving daemon (cli.serve).

Fires `--concurrency` closed-loop clients at /v1/transcribe with synthetic
16 kHz PCM (each request = one `--seconds`-second utterance + enrollment),
then reports sustained throughput (requests/s, audio-seconds/s => online
RTF) and latency percentiles. The daemon's micro-batcher coalesces these
concurrent requests into full device batches, so `--concurrency` at or
above the daemon's --batch_size measures the saturated operating point.

Usage (against a running daemon)::

    python examples/serve_loadgen.py --port 8777 --concurrency 64 \
        --duration 60 --seconds 30
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def _client(url: str, body: bytes, stop_at: float, lat: list, lock) -> None:
    while time.monotonic() < stop_at:
        t0 = time.monotonic()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                json.loads(resp.read())
        except OSError:  # transient connect failure under burst load
            time.sleep(0.05)
            continue
        dt = time.monotonic() - t0
        with lock:
            lat.append(dt)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--concurrency", type=int, default=32)
    p.add_argument("--duration", type=float, default=60.0,
                   help="measurement window in seconds (after warmup)")
    p.add_argument("--warmup_s", type=float, default=10.0)
    p.add_argument("--seconds", type=float, default=30.0,
                   help="audio seconds per request")
    p.add_argument("--enroll_seconds", type=float, default=10.0)
    args = p.parse_args()

    url = f"http://{args.host}:{args.port}/v1/transcribe"
    sr = 16000
    # Low-amplitude deterministic tone: decodes fast (EOT early) like the
    # offline bench's synthetic rows. Sent as base64 WAV (16-bit PCM) —
    # ~1.3 MB/request vs ~6 MB as a JSON float list, so the measurement
    # stays on the device, not in the host's JSON parser.
    import base64
    import io
    import math
    import struct
    import wave

    def wav_b64(seconds: float, hz: float) -> str:
        m = int(seconds * sr)
        pcm = struct.pack(
            f"<{m}h",
            *(int(0.01 * 32767 * math.sin(2 * math.pi * hz * i / sr))
              for i in range(m)),
        )
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm)
        return base64.b64encode(buf.getvalue()).decode()

    body = json.dumps({
        "speech_wav": wav_b64(args.seconds, 440.0),
        "enroll_wav": wav_b64(args.enroll_seconds, 330.0),
    }).encode()

    lock = threading.Lock()
    warm_lat: list = []
    stop_warm = time.monotonic() + args.warmup_s
    threads = [
        threading.Thread(
            target=_client, args=(url, body, stop_warm, warm_lat, lock),
            daemon=True,
        )
        for _ in range(args.concurrency)
    ]
    for t in threads:  # staggered ramp: don't SYN-flood the listen queue
        t.start()
        time.sleep(0.01)
    for t in threads:
        t.join()

    lat: list = []
    t0 = time.monotonic()
    stop_at = t0 + args.duration
    threads = [
        threading.Thread(
            target=_client, args=(url, body, stop_at, lat, lock), daemon=True
        )
        for _ in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0

    lat.sort()
    nreq = len(lat)
    rps = nreq / elapsed
    audio_per_s = rps * args.seconds
    pct = lambda q: lat[min(nreq - 1, int(q * nreq))] if nreq else float("nan")
    print(json.dumps({
        "requests": nreq,
        "elapsed_s": round(elapsed, 2),
        "requests_per_s": round(rps, 2),
        "audio_s_per_s": round(audio_per_s, 1),
        "online_rtf_x": round(audio_per_s, 1),
        "latency_p50_s": round(pct(0.50), 3),
        "latency_p95_s": round(pct(0.95), 3),
        "latency_max_s": round(lat[-1] if nreq else float("nan"), 3),
        "concurrency": args.concurrency,
        "audio_seconds_per_request": args.seconds,
    }))


if __name__ == "__main__":
    main()
