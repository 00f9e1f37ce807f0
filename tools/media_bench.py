#!/usr/bin/env python3
"""Single-thread media-decode kernel bench (round-6 judge item #1).

Pinned deterministic fixtures (>64×64, no external data), decoded by the
registered from-scratch decoders, best-of-N wall each. Prints ONE JSON
line so rounds can be compared: the round-5 decoder's numbers on these
exact fixtures are recorded in BENCH/BASELINE.md §7 (measured in-session
by importing the r5 module from git alongside the current one).

Fixtures:
  jpeg-q50-444   256×256 RGB photo-like (gradient+sine+noise), ITU T.81
                 K.1 luminance quant table — what a real corpus JPEG
                 carries
  jpeg-q50-420   same content, 4:2:0 + restart interval 8
  jpeg-q1-gray   256×256 grayscale near-lossless (dense coefficients —
                 the symbol-chase worst case)
  png-paeth      256×256 RGB, all-Paeth scanlines (the recurrent filter)
  wav-pcm16      2 s stereo 44.1 kHz sine

Usage: python tools/media_bench.py [iters] [--compare-git REF]
  --compare-git REF  also time the decoder as of git REF (e.g. HEAD~1 or
                     a round tag) on the same fixtures, interleaved, and
                     report speedups.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

Q50 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.int64,
)


def _photo(n: int = 256) -> np.ndarray:
    rng = np.random.default_rng(7)
    x = np.linspace(0, 255, n)
    g = (np.add.outer(x, x) / 2 + 40 * np.sin(np.add.outer(x / 9, x / 13))
         + rng.normal(0, 6, (n, n))).clip(0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 7, 0), np.roll(g, 13, 1)], axis=-1)


def build_fixtures() -> dict[str, tuple[str, bytes]]:
    """{name: (mime, payload)} — deterministic, no external data."""
    from tokenlake.jpeg_codec import encode_jpeg
    from tokenlake.multimodal import encode_png, encode_wav

    img3 = _photo()
    gray = img3[..., 0].copy()
    t = np.arange(2 * 44100) / 44100.0
    wave = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    stereo = np.stack([wave, np.roll(wave, 17)], axis=-1)
    return {
        "jpeg-q50-444": ("image/jpeg", encode_jpeg(img3, quant=Q50)),
        "jpeg-q50-420": ("image/jpeg", encode_jpeg(img3, quant=Q50, subsample=True,
                                                   restart_interval=8)),
        "jpeg-q1-gray": ("image/jpeg", encode_jpeg(gray, quant=1)),
        "png-paeth": ("image/png", encode_png(img3, filter_type=4)),
        "wav-pcm16": ("audio/wav", encode_wav(stereo, rate=44100)),
    }


def _decoder_for(mod_jpeg, mod_mm, mime: str):
    return {
        "image/jpeg": mod_jpeg.decode_jpeg,
        "image/png": mod_mm.decode_png,
        "audio/wav": mod_mm.decode_wav,
    }[mime]


def _load_git(ref: str):
    """Import (jpeg_codec, multimodal) as of a git ref, as a throwaway
    package so multimodal's relative `.jpeg_codec` import resolves to the
    SAME ref's decoder."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    td = tempfile.mkdtemp(prefix="tl_media_ref_")
    pkg = os.path.join(td, "tl_ref_pkg")
    os.makedirs(pkg)
    with open(os.path.join(pkg, "__init__.py"), "w"):
        pass
    for name in ("jpeg_codec", "multimodal"):
        src = subprocess.run(
            ["git", "-C", root, "show", f"{ref}:tokenlake/{name}.py"],
            capture_output=True, check=True,
        ).stdout
        with open(os.path.join(pkg, f"{name}.py"), "wb") as fh:
            fh.write(src)
    sys.path.insert(0, td)
    try:
        import importlib

        mm = importlib.import_module("tl_ref_pkg.multimodal")
        jc = importlib.import_module("tl_ref_pkg.jpeg_codec")
    finally:
        sys.path.remove(td)
    return jc, mm


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 9
    ref = None
    if "--compare-git" in sys.argv:
        ref = sys.argv[sys.argv.index("--compare-git") + 1]

    from tokenlake import jpeg_codec as cur_jpeg
    from tokenlake import multimodal as cur_mm

    fixtures = build_fixtures()
    old_jpeg = old_mm = None
    if ref:
        old_jpeg, old_mm = _load_git(ref)

    out: dict = {"metric": "media_decode_kernel", "iters": iters, "fixtures": {}}
    try:
        from bench import host_gauge

        out["host_gauge"] = host_gauge()
    except Exception:
        pass
    for name, (mime, payload) in fixtures.items():
        dec = _decoder_for(cur_jpeg, cur_mm, mime)
        o = dec(payload)
        nbytes = int(np.asarray(o).nbytes)
        row = {"payload_bytes": len(payload), "decoded_bytes": nbytes}
        tn, to = [], []
        odec = _decoder_for(old_jpeg, old_mm, mime) if ref else None
        if odec is not None:
            o_ref = odec(payload)
            row["identical_to_ref"] = bool(np.array_equal(np.asarray(o), np.asarray(o_ref)))
        for _ in range(iters):  # interleaved: host noise hits both sides
            t0 = time.perf_counter()
            dec(payload)
            tn.append(time.perf_counter() - t0)
            if odec is not None:
                t0 = time.perf_counter()
                odec(payload)
                to.append(time.perf_counter() - t0)
        row["decode_ms"] = round(min(tn) * 1e3, 3)
        row["decode_MBps"] = round(nbytes / min(tn) / 1e6, 2)
        if to:
            row["ref_decode_ms"] = round(min(to) * 1e3, 3)
            row["speedup_vs_ref"] = round(min(to) / min(tn), 2)
        out["fixtures"][name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
