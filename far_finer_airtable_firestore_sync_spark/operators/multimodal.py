"""Multimodal (image/audio/video) column plumbing.

North-star extension: treat media as opaque ``binary`` columns with a
typed metadata struct, and run decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` stages.

Decoders (pluggable, per the ``decoder=`` argument):

- ``"ppm"`` — REAL image decode for Netpbm P6 (dependency-free byte
  parsing): width/height + per-channel means. Undecodable bytes yield
  a NULL feature (row survives; decode errors are data, not crashes).
- ``"wav"`` — REAL audio decode via the stdlib ``wave`` module:
  channels/rate/duration + mean absolute amplitude.
- ``"fake"`` — deterministic digest-based stand-in (contract tests).
- ``"pillow"`` — general image codecs (PNG/JPEG/…) behind a guarded
  import: registered only when Pillow is importable (it is not baked
  into this container — the decoder self-tests via Pillow-encoded
  bytes when present, and requesting it without Pillow raises
  ``NotImplementedError`` naming the dependency). Same feature shape
  as ``"ppm"``: [width, height, band means...].

Scale notes: media rows are large, so the operators avoid shuffling
binary payloads — every stage is a mapInPandas projection (no
exchange), and feature vectors (small) are what downstream joins ever
see. Partition sizing: keep ``spark.sql.files.maxPartitionBytes`` low
enough that one Arrow batch of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_hash string, "
    "feature array<double>"
)


def attach_media_columns(
    df: DataFrame, payload_col: str, media_type: str = "image/fake"
) -> DataFrame:
    """Wrap an existing column's bytes as a media row (fixture helper:
    the test tables carry no real media, so text bytes stand in)."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.expr(
            "named_struct('width', cast(null as int), 'height', cast(null as int),"
            " 'sample_rate', cast(null as int), 'duration_ms', cast(null as int))"
        ).alias("meta"),
    )


def synth_ppm_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic P6 image per row (fixture synthesis): a solid
    (w x h) raster whose dimensions and RGB are pure functions of the
    id — so downstream REAL decode output is closed-form predictable
    (the oracle recomputes the expected features from the id alone,
    hash-verifying the actual byte-parsing path).

    Same mapInPandas shape as production ingestion: blobs are born and
    decoded inside one partition, never shuffled."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 16 + 1, i % 8 + 1
                px = bytes([i % 256, (i * 7) % 256, (i * 13) % 256])
                blobs.append(
                    f"P6 {w} {h} 255 ".encode("ascii") + px * (w * h)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "image/x-portable-pixmap",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


def synth_wav_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 16-bit mono PCM WAV per row (fixture synthesis):
    a square wave whose amplitude, half-period, and length are pure
    functions of the id — so REAL decode output is closed-form
    predictable (square waves have exact RMS = amplitude and an exact
    crossing count), letting the oracle hash-verify the actual
    byte-parsing path just like ``synth_ppm_blobs`` does for images.

    amp = (id % 100 + 1) * 300  (<= 30000, inside int16)
    half = id % 5 + 2           (samples per half-period)
    n = id % 50 + 20            (total samples), rate = 8000 Hz
    sample i = +amp if (i // half) even else -amp
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                amp, half, n = (i % 100 + 1) * 300, i % 5 + 2, i % 50 + 20
                samples = [
                    amp if (j // half) % 2 == 0 else -amp for j in range(n)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                blobs.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "audio/wav",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, n_samples long, "
    "rms double, zcr double"
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction (stdlib ``wave`` + struct parse,
    16-bit PCM): per clip, RMS amplitude (normalized by 2^15 — an
    exact power-of-two division) and zero-crossing rate (sign flips /
    (n-1)). The training-data audio-quality primitives: RMS gates
    silence/clipping, ZCR is the classic voiced/unvoiced hint.

    Same scale shape as the image path: mapInPandas projection, blobs
    decoded where they live and never shuffled; only the small feature
    row moves on. Undecodable bytes yield NULL features (quarantine
    rows, not crashes)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import math
        import struct
        import wave

        import pandas as pd

        def one(content):
            try:
                with wave.open(io.BytesIO(bytes(content))) as w:
                    nch, width, rate, nframes = (
                        w.getnchannels(), w.getsampwidth(),
                        w.getframerate(), w.getnframes(),
                    )
                    frames = w.readframes(nframes)
            except (wave.Error, EOFError, struct.error, TypeError):
                return None
            # mono 16-bit PCM contract: multi-channel frames are
            # interleaved, so n_samples would double-count and zcr
            # would compare L[i] against R[i] — quarantine rather
            # than emit silently-wrong features
            if width != 2 or nch != 1:
                return None
            n = len(frames) // 2
            vals = struct.unpack(f"<{n}h", frames[: 2 * n])
            if n == 0:
                return (nch, rate, 0, 0.0, 0.0)
            rms = math.sqrt(sum(v * v for v in vals) / n) / 32768.0
            flips = sum(
                1
                for a, b in zip(vals, vals[1:])
                if (a >= 0) != (b >= 0)
            )
            zcr = flips / (n - 1) if n > 1 else 0.0
            return (nch, rate, n, rms, zcr)

        for pdf in batches:
            feats = [one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_channels": [f[0] if f else None for f in feats],
                    "sample_rate": [f[1] if f else None for f in feats],
                    "n_samples": [f[2] if f else None for f in feats],
                    "rms": [f[3] if f else None for f in feats],
                    "zcr": [f[4] if f else None for f in feats],
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def synth_y4m_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic YUV4MPEG2 (Y4M) clip per row — a REAL public
    header+raw-frames video container (mplayer/ffmpeg's uncompressed
    interchange format), writable and parseable byte-for-byte in pure
    Python, so the frame-sampling path decodes REAL video structure
    without codec libraries (the same fixture-synthesis move as
    ``synth_ppm_blobs``/``synth_wav_blobs``).

    4x2 C444 clips; frame f's luma plane is the CONSTANT
    (id*7 + f*13) % 256 and chroma is flat 128, so every sampled-frame
    statistic is closed-form from the id alone:

    n_frames = id % 12 + 4;  luma(f) = (id*7 + f*13) % 256
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        w, h = 4, 2
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                n = i % 12 + 4
                out = [b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C444\n"]
                for f in range(n):
                    y = (i * 7 + f * 13) % 256
                    out.append(b"FRAME\n")
                    out.append(bytes([y]) * (w * h))      # Y plane
                    out.append(bytes([128]) * (w * h) * 2)  # U+V planes
                blobs.append(b"".join(out))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "video/x-yuv4mpeg",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


FRAME_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_frames long, "
    "n_sampled long, mean_luma double"
)


def video_frame_features(df: DataFrame, every_k: int = 3) -> DataFrame:
    """REAL video frame sampling: parse the Y4M header (geometry +
    colorspace), walk the frame stream, decode every ``every_k``-th
    frame's luma plane, and emit per-clip sampled statistics — the
    training-pipeline shape for thumbnailing / frame-dedup /
    vision-encoder sampling, where decoding every frame is the cost
    you're avoiding.

    Scale shape: mapInPandas projection — clips are parsed where they
    live, only (id, geometry, stats) rows move on. Undecodable bytes,
    unsupported colorspaces and truncated frame payloads yield NULL
    features (quarantine rows, not crashes)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def one(content):
            try:
                buf = bytes(content)
                nl = buf.index(b"\n")
                head = buf[:nl].decode("ascii")
                if not head.startswith("YUV4MPEG2"):
                    return None
                params = dict(
                    (p[0], p[1:]) for p in head.split(" ")[1:] if p
                )
                w, h = int(params["W"]), int(params["H"])
                if w <= 0 or h <= 0:
                    return None  # zero-area geometry: quarantine, not
                    # a ZeroDivisionError aborting the whole task
                # C444: three full planes; default (absent C) is 4:2:0
                c = params.get("C", "420")
                if c == "444":
                    frame_bytes = w * h * 3
                elif c.startswith("420"):
                    frame_bytes = w * h * 3 // 2
                else:
                    return None
                pos, n_frames, n_sampled, luma_sum = nl + 1, 0, 0, 0
                while pos < len(buf):
                    fe = buf.index(b"\n", pos)
                    if not buf[pos:fe].startswith(b"FRAME"):
                        return None
                    data = buf[fe + 1 : fe + 1 + frame_bytes]
                    if len(data) < frame_bytes:
                        return None  # truncated frame payload
                    if n_frames % every_k == 0:
                        n_sampled += 1
                        plane = data[: w * h]
                        luma_sum += sum(plane) / (w * h)
                    n_frames += 1
                    pos = fe + 1 + frame_bytes
                mean = luma_sum / n_sampled if n_sampled else None
                return (w, h, n_frames, n_sampled, mean)
            except (ValueError, KeyError, UnicodeDecodeError, TypeError):
                return None

        for pdf in batches:
            feats = [one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] if f else None for f in feats],
                    "height": [f[1] if f else None for f in feats],
                    "n_frames": [f[2] if f else None for f in feats],
                    "n_sampled": [f[3] if f else None for f in feats],
                    "mean_luma": [f[4] if f else None for f in feats],
                }
            )

    return df.mapInPandas(run, FRAME_FEATURE_SCHEMA)


def _fake_decode(content: bytes) -> Optional[list[float]]:
    """Deterministic stand-in 'decoder': 8 features from the digest.

    NOT a real decode — a byte-stable fake so the distributed plumbing
    is testable without codecs.
    """
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:8]]


def parse_ppm(content: bytes) -> Optional[tuple[int, int, int, bytes]]:
    """Parse a binary Netpbm P6 image: (width, height, maxval, rgb
    bytes), or None if the bytes are not a well-formed P6."""
    import re

    # header = magic, width, height, maxval; exactly ONE whitespace byte
    # separates maxval from the raster (raster bytes may themselves be
    # whitespace values, so a free-form split would eat pixels).
    # Comments not supported — fixture-grade subset of the spec.
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", content)
    if m is None:
        return None
    width, height, maxval = int(m[1]), int(m[2]), int(m[3])
    raw = content[m.end():]
    need = width * height * 3
    # maxval > 255 means 2-byte big-endian samples per the P6 spec —
    # the 1-byte indexing below would silently misread them, so reject.
    if width <= 0 or height <= 0 or not (0 < maxval <= 255) or len(raw) < need:
        return None
    return width, height, maxval, raw[:need]


def _ppm_decode(content: bytes) -> Optional[list[float]]:
    """REAL image decode (P6): [width, height, mean_r, mean_g, mean_b]
    with channel means normalized by maxval."""
    parsed = parse_ppm(content)
    if parsed is None:
        return None
    width, height, maxval, raw = parsed
    n = width * height
    sums = [0, 0, 0]
    for i in range(0, 3 * n, 3):
        sums[0] += raw[i]
        sums[1] += raw[i + 1]
        sums[2] += raw[i + 2]
    return [
        float(width),
        float(height),
        sums[0] / (n * maxval),
        sums[1] / (n * maxval),
        sums[2] / (n * maxval),
    ]


def _wav_decode(content: bytes) -> Optional[list[float]]:
    """REAL audio decode via stdlib ``wave``: [n_channels, sample_rate,
    duration_ms, mean_abs_amplitude] (16-bit PCM; other widths yield
    metadata with a NaN-free 0.0 amplitude placeholder)."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch, width, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes(),
            )
            frames = w.readframes(nframes)
    except (wave.Error, EOFError, struct.error):
        return None
    duration_ms = 1000.0 * nframes / rate if rate else 0.0
    mean_abs = 0.0
    if width == 2 and frames:
        n = len(frames) // 2
        vals = struct.unpack(f"<{n}h", frames[: 2 * n])
        mean_abs = sum(abs(v) for v in vals) / (n * 32768.0) if n else 0.0
    return [float(nch), float(rate), duration_ms, mean_abs]


try:  # optional dependency: general image codecs
    from PIL import Image as _PILImage
except ImportError:  # container default: Pillow absent
    _PILImage = None


def _pillow_decode(content: bytes) -> Optional[list[float]]:
    """REAL general-image decode (PNG/JPEG/… via Pillow when
    installed): [width, height, band means normalized to 0..1],
    matching the `"ppm"` feature shape so downstream consumers are
    codec-agnostic. Undecodable bytes yield None (quarantine row)."""
    import io

    try:
        img = _PILImage.open(io.BytesIO(content))
        img.load()
    except Exception:
        return None
    stats = []
    for band_hist in _band_histograms(img):
        total = sum(band_hist)
        if total == 0:
            stats.append(0.0)
        else:
            stats.append(
                sum(i * c for i, c in enumerate(band_hist)) / (total * 255.0)
            )
    return [float(img.width), float(img.height), *stats]


def _band_histograms(img) -> list[list[int]]:
    """Per-band 256-bin histograms (Pillow packs them back-to-back)."""
    hist = img.histogram()
    n_bands = max(1, len(hist) // 256)
    return [hist[b * 256:(b + 1) * 256] for b in range(n_bands)]


_DECODERS = {"fake": _fake_decode, "ppm": _ppm_decode, "wav": _wav_decode}
if _PILImage is not None:
    _DECODERS["pillow"] = _pillow_decode


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    One projection stage: no shuffle, blobs never leave their
    partition; output rows are small feature vectors. Undecodable or
    NULL payloads produce ``feature = NULL`` (bad media is data to
    quarantine downstream, not a job failure).
    """
    if decoder not in _DECODERS:
        raise NotImplementedError(
            f"decoder {decoder!r}: general-purpose media codecs are not "
            "available in this environment (installing Pillow enables "
            "'pillow' for PNG/JPEG; wire torchaudio similarly), keeping "
            f"the same mapInPandas contract (have: {sorted(_DECODERS)})"
        )
    decode = _DECODERS[decoder]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                feats.append(decode(b))
                hashes.append(hashlib.md5(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_ppm(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of P6 images — a REAL pixel transform
    with the production plumbing (mapInPandas projection, blobs stay
    in their partition). Output column ``content`` holds the resized
    P6 bytes; undecodable inputs pass through as NULL."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def one(content) -> Optional[bytes]:
            parsed = parse_ppm(bytes(content) if content is not None else b"")
            if parsed is None:
                return None
            w, h, maxval, raw = parsed
            out = bytearray()
            for y in range(out_h):
                sy = y * h // out_h
                base = sy * w
                for x in range(out_w):
                    sx = x * w // out_w
                    p = (base + sx) * 3
                    out += raw[p : p + 3]
            header = f"P6\n{out_w} {out_h}\n{maxval}\n".encode()
            return header + bytes(out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": [one(c) for c in pdf["content"]],
                }
            )

    return df.mapInPandas(run, "media_id long, media_type string, content binary")


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per
    sampled offset (byte-level stand-in for video frame extraction —
    the explode pattern and output cardinality contract are the real
    thing)."""
    idx = F.expr(
        f"sequence(0, least(int(length(content) / {every_n_bytes}), {max_frames - 1}))"
    )
    return df.select(
        "media_id",
        F.explode(idx).alias("frame_no"),
        F.expr(
            f"substring(content, frame_no * {every_n_bytes} + 1, {every_n_bytes})"
        ).alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup): gradient fixture + dHash
# ---------------------------------------------------------------------------

#: dHash grid: 9 columns x 8 rows -> 8x8 adjacent-column comparisons
DHASH_W, DHASH_H = 9, 8


def gradient_channels(i: int, x: int, y: int) -> tuple[int, int, int]:
    """Pixel channels of the synthetic gradient raster — a PURE
    function of (image id, x, y), shared verbatim with the DuckDB
    oracle's closed form (``gradient_gray_sum_sql``) so the REAL
    byte-decode -> dHash path is hash-verifiable end-to-end.

    Id ranges encode the corpus variants: ids in [500000, 1000000)
    are +3-perturbed (top-left quadrant, inside the modulus) copies of
    id-500000; ids >= 1000000 are exact copies of id-1000000."""
    # FLAT id-namespace decode — identical to the oracle's single
    # CASE, never recursive: a recursion for i >= 1M would re-enter
    # the perturbation branch when the decoded base is itself >=
    # 500k, silently diverging from the oracle at large doc_ids
    # (review finding). Base doc_ids must stay below 500k — enforced
    # loudly at synthesis time (synth_gradient_ppm_blobs).
    if i >= 1_000_000:
        base, bump = i - 1_000_000, 0
    elif i >= 500_000:
        base = i - 500_000
        bump = 3 if x < 4 and y < 4 else 0
    else:
        base, bump = i, 0
    # Two measured dead ends shaped this formula: (1) additive-only
    # gradients make adjacent-column gray DIFFERENCES id-independent
    # (every image shares one dHash up to modulus wraps — 63k junk
    # pairs at sf0.1); (2) a single linear id term collapses to
    # id % 256 under the channel modulus (256 distinct images total).
    # So BOTH id bytes multiply different (x, y)-varying factors —
    # distinct ids below 2^16 get distinct pixel functions and dHash
    # collisions drop to the exact/perturbed copies by construction.
    lo, hi = base % 256, (base // 256) % 256
    r = (
        lo * (x + 1) * (y + 1) + hi * (y + 2 * x + 3)
        + 17 * x * x + 23 * y * y + bump
    ) % 256
    g = (lo * (x * x + y + 2) + hi * (x * y + 5) + 11 * x) % 256
    b = (lo * (7 * x + y * y + 1) + hi * (3 * x + y + 7) + 13 * y) % 256
    return r, g, b


def synth_gradient_ppm_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 9x8 P6 gradient image per row — non-constant
    rasters so perceptual hashing is non-degenerate (the solid-color
    ``synth_ppm_blobs`` fixture dHashes to all-zeros)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                if not 0 <= i < 1_500_000:
                    raise ValueError(
                        f"gradient id {i} outside the namespace contract "
                        "(base < 500k; +500k perturbed; +1M exact copy)"
                    )
                px = bytearray()
                for y in range(DHASH_H):
                    for x in range(DHASH_W):
                        px.extend(gradient_channels(i, x, y))
                blobs.append(
                    f"P6 {DHASH_W} {DHASH_H} 255 ".encode("ascii") + bytes(px)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "image/x-portable-pixmap",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


def image_dhash(df: DataFrame) -> DataFrame:
    """64-bit dHash per image from REAL P6 byte decode:
    bit(x, y) = [gray(x+1, y) > gray(x, y)] over the 9x8 raster,
    packed row-major into a 16-char hex string (the SimHash hex
    convention, so ``dedup_docs.hex_hamming_pairs`` applies as-is).

    gray is the CHANNEL SUM r+g+b (not the mean): comparisons of sums
    equal comparisons of means, and staying integer keeps the hash
    bit-identical to the oracle's closed form. Undecodable or
    wrong-geometry blobs yield NULL (quarantine row, never a crash).

    Scale shape: mapInPandas projection — blobs decode where they
    live and only (media_id, 16-char hash) ever shuffles."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def one(content) -> Optional[str]:
            parsed = parse_ppm(bytes(content)) if content is not None else None
            if parsed is None:
                return None
            w, h, _maxval, raw = parsed
            if (w, h) != (DHASH_W, DHASH_H):
                return None
            bits = []
            for y in range(DHASH_H):
                for x in range(DHASH_W - 1):
                    a = (y * w + x) * 3
                    b = (y * w + x + 1) * 3
                    ga = raw[a] + raw[a + 1] + raw[a + 2]
                    gb = raw[b] + raw[b + 1] + raw[b + 2]
                    bits.append(1 if gb > ga else 0)
            val = 0
            for bit in bits:
                val = (val << 1) | bit
            return f"{val:016x}"

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [one(c) for c in pdf["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, dhash string"
    )


# ---------------------------------------------------------------------------
# Audio fingerprinting (energy-contour hash): gradient PCM + real decode
# ---------------------------------------------------------------------------

#: fingerprint geometry: 65 frames x 4 samples -> 64 adjacent-frame
#: energy comparisons -> 64-bit hash (hex16, hamming-joinable)
AFP_FRAMES, AFP_FRAME_LEN = 65, 4
AFP_N_SAMPLES = AFP_FRAMES * AFP_FRAME_LEN


def gradient_pcm_sample(i: int, j: int) -> int:
    """Sample j of the synthetic PCM clip for id i — a PURE function
    shared verbatim with the DuckDB oracle. Same id-namespace contract
    and entropy lessons as :func:`gradient_channels` (both id bytes
    multiply j-varying factors; perturbed copies bump inside the
    modulus over frames 0..15)."""
    if i >= 1_000_000:
        base, bump = i - 1_000_000, 0
    elif i >= 500_000:
        base = i - 500_000
        bump = 16 if j < 64 else 0
    else:
        base, bump = i, 0
    lo, hi = base % 256, (base // 256) % 256
    return ((lo * ((j * j) % 251 + 3) + hi * (5 * j + 7) + j + bump)
            % 2048) - 1024


def synth_gradient_wav_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 16-bit mono PCM per row with NON-degenerate
    energy contours (the square-wave ``synth_wav_blobs`` fixture has
    a periodic sign pattern — useless for fingerprinting)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                if not 0 <= i < 1_500_000:
                    raise ValueError(
                        f"gradient id {i} outside the namespace contract"
                    )
                samples = [
                    gradient_pcm_sample(i, j) for j in range(AFP_N_SAMPLES)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        struct.pack(f"<{AFP_N_SAMPLES}h", *samples)
                    )
                blobs.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "audio/wav",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


def audio_energy_fingerprint(df: DataFrame) -> DataFrame:
    """64-bit energy-contour fingerprint per clip from REAL WAV byte
    decode: bit(f) = [E(f+1) > E(f)] over 65 4-sample frames, where
    E(f) is the exact integer sum of squared samples — packed to the
    16-hex SimHash convention so ``dedup_docs.hex_hamming_pairs``
    applies unchanged (one 64-bit Hamming join serves text, image AND
    audio). Wrong geometry / undecodable bytes -> NULL quarantine.

    Scale shape: mapInPandas projection — clips decode where they
    live; only (media_id, 16-hex hash) shuffles."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import struct
        import wave

        import pandas as pd

        def one(content) -> Optional[str]:
            if content is None:
                return None
            # the WHOLE body quarantines: wave derives nframes from the
            # chunk-size header field, so a truncated data chunk passes
            # the geometry checks and only unpack() notices (review
            # finding — struct.error outside the try crashed the task)
            try:
                with wave.open(io.BytesIO(bytes(content))) as w:
                    if (
                        w.getnchannels() != 1
                        or w.getsampwidth() != 2
                        or w.getnframes() != AFP_N_SAMPLES
                    ):
                        return None
                    raw = w.readframes(AFP_N_SAMPLES)
                samples = struct.unpack(f"<{AFP_N_SAMPLES}h", raw)
            except Exception:
                return None
            energies = [
                sum(
                    s * s
                    for s in samples[f * AFP_FRAME_LEN:(f + 1) * AFP_FRAME_LEN]
                )
                for f in range(AFP_FRAMES)
            ]
            val = 0
            for f in range(AFP_FRAMES - 1):
                val = (val << 1) | (1 if energies[f + 1] > energies[f] else 0)
            return f"{val:016x}"

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": [one(c) for c in pdf["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, afp string"
    )


# ---------------------------------------------------------------------------
# Video fingerprinting (luma-contour hash): gradient Y4M + real decode
# ---------------------------------------------------------------------------

#: clip geometry: 65 frames of 4x2 C444 -> 64 adjacent-frame luma-sum
#: comparisons -> 64-bit hash (hex16, hamming-joinable)
#: scene-cut threshold on adjacent-frame luma-sum deltas (measured:
#: ~11% of the gradient corpus' transitions exceed it — a realistic
#: cut rate, neither degenerate-none nor every-frame)
SCENE_CUT_THRESHOLD = 900


def video_scene_cuts(
    df: DataFrame, threshold: int = SCENE_CUT_THRESHOLD
) -> DataFrame:
    """Scene-cut detection per clip from REAL Y4M byte parsing: a cut
    at frame f+1 when |S(f+1) - S(f)| > threshold, with S(f) the exact
    integer luma-plane sum — the shot-boundary primitive a video
    training pipeline needs before frame sampling (sample per shot,
    not per fixed stride). Returns (media_id, n_cuts, first_cut);
    wrong geometry / truncated streams quarantine to NULL counts.

    Scale shape: mapInPandas projection — clips decode where they
    live; only three small columns shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        npx = VFP_W * VFP_H
        stride = 6 + npx * 3

        def one(content):
            try:
                buf = bytes(content)
                nl = buf.index(b"\n")
                head = buf[:nl].decode("ascii")
                if not head.startswith("YUV4MPEG2"):
                    return None, None
                params = dict(
                    (p[0], p[1:]) for p in head.split(" ")[1:] if p
                )
                if (int(params["W"]), int(params["H"])) != (VFP_W, VFP_H) \
                        or params.get("C") != "444":
                    return None, None
                body = np.frombuffer(buf, dtype=np.uint8, offset=nl + 1)
                if body.size != VFP_FRAMES * stride:
                    return None, None
                grid = body.reshape(VFP_FRAMES, stride)
                marker = np.frombuffer(b"FRAME\n", dtype=np.uint8)
                if not (grid[:, :6] == marker).all():
                    return None, None
                sums = grid[:, 6:6 + npx].astype(np.int64).sum(axis=1)
                cuts = np.abs(np.diff(sums)) > threshold
                idx = np.nonzero(cuts)[0]
                return int(cuts.sum()), (int(idx[0]) + 1 if idx.size else None)
            except (ValueError, KeyError, UnicodeDecodeError, TypeError):
                return None, None

        for pdf in batches:
            pairs = [one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_cuts": pd.array(
                        [p[0] for p in pairs], dtype="Int64"
                    ),
                    "first_cut": pd.array(
                        [p[1] for p in pairs], dtype="Int32"
                    ),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, n_cuts bigint, first_cut int"
    )


#: chroma-style fingerprint geometry: 17 frames of 15 samples (the
#: first 255 of the clip's 260), 4 square-wave bands -> 16 transitions
#: x 4 bands = 64 bits (hex16, hamming-joinable)
CFP_FRAMES, CFP_FRAME_LEN = 17, 15
CFP_BANDS = (1, 2, 4, 8)  # square-wave half-periods (samples)


def audio_chroma_fingerprint(df: DataFrame) -> DataFrame:
    """Chromaprint-style 64-bit audio fingerprint from REAL WAV byte
    decode: per frame, the clip's energy in 4 FREQUENCY bands —
    square-wave correlations at half-periods 1/2/4/8 samples (a
    Walsh-basis stand-in for the DFT chroma bins: ±1 coefficients keep
    every operation exact-integer, so the DuckDB oracle replays it
    bit-for-bit, where floating trig would drift cross-engine) —
    then bit(f, b) = [E_b(f+1) > E_b(f)], the Chromaprint
    band-energy-difference filter shape. Packed f-major/band-minor to
    the 16-hex convention so ``dedup_docs.hex_hamming_pairs`` applies
    unchanged (the energy-contour fingerprint's time-domain view and
    this spectral view ride the SAME Hamming join).

    Scale shape: mapInPandas projection — clips decode where they
    live; only (media_id, 16-hex hash) shuffles."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import struct
        import wave

        import pandas as pd

        def one(content) -> Optional[str]:
            if content is None:
                return None
            try:
                with wave.open(io.BytesIO(bytes(content))) as w:
                    if (
                        w.getnchannels() != 1
                        or w.getsampwidth() != 2
                        or w.getnframes() != AFP_N_SAMPLES
                    ):
                        return None
                    raw = w.readframes(AFP_N_SAMPLES)
                samples = struct.unpack(f"<{AFP_N_SAMPLES}h", raw)
            except Exception:
                return None
            # E[f][b] = (sum_j s[f*15+j] * sign_b(j))^2, sign_b(j) =
            # +1 iff (j // h_b) is even — all integers, no rounding
            energies = []
            for f in range(CFP_FRAMES):
                frame = samples[
                    f * CFP_FRAME_LEN:(f + 1) * CFP_FRAME_LEN
                ]
                row = []
                for h in CFP_BANDS:
                    c = sum(
                        s if (j // h) % 2 == 0 else -s
                        for j, s in enumerate(frame)
                    )
                    row.append(c * c)
                energies.append(row)
            val = 0
            for f in range(CFP_FRAMES - 1):
                for b in range(len(CFP_BANDS)):
                    val = (val << 1) | (
                        1 if energies[f + 1][b] > energies[f][b] else 0
                    )
            return f"{val:016x}"

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "cfp": [one(c) for c in pdf["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, cfp string"
    )


def audio_dynamics(
    df: DataFrame, loud_abs: int = 512, quiet_abs: int = 64
) -> DataFrame:
    """Clip dynamics from REAL WAV byte decode: peak absolute sample,
    loud/quiet sample counts, and the integer DC sum — the
    silence/clipping screen a speech-curation pipeline runs before
    paying for feature extraction. All outputs are integers over the
    decoded PCM, so the DuckDB oracle replays them exactly from the
    synth formula (gradient_pcm_sample).

    Scale shape: mapInPandas projection — clips decode where they
    live; only (media_id, 4 small ints) shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import io
        import struct
        import wave

        import pandas as pd

        def one(content):
            if content is None:
                return (None, None, None, None)
            try:
                with wave.open(io.BytesIO(bytes(content))) as w:
                    if (
                        w.getnchannels() != 1
                        or w.getsampwidth() != 2
                        or w.getnframes() != AFP_N_SAMPLES
                    ):
                        return (None, None, None, None)
                    raw = w.readframes(AFP_N_SAMPLES)
                s = struct.unpack(f"<{AFP_N_SAMPLES}h", raw)
            except Exception:
                return (None, None, None, None)
            return (
                max(abs(x) for x in s),
                sum(1 for x in s if abs(x) >= loud_abs),
                sum(1 for x in s if abs(x) <= quiet_abs),
                sum(s),
            )

        for pdf in batches:
            vals = [one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # nullable Int64: a quarantined (undecodable) clip
                    # must surface as NULL, not coerce the column to
                    # float
                    "peak_abs": pd.array(
                        [v[0] for v in vals], dtype="Int64"
                    ),
                    "n_loud": pd.array([v[1] for v in vals], dtype="Int64"),
                    "n_quiet": pd.array(
                        [v[2] for v in vals], dtype="Int64"
                    ),
                    "dc_sum": pd.array([v[3] for v in vals], dtype="Int64"),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run,
        "media_id long, peak_abs int, n_loud bigint, n_quiet bigint,"
        " dc_sum bigint",
    )


VFP_FRAMES, VFP_W, VFP_H = 65, 4, 2


def gradient_luma(i: int, f: int, x: int, y: int) -> int:
    """Luma of pixel (x, y) in frame f of the synthetic clip for id i
    — pure function shared with the DuckDB oracle; same id-namespace
    and entropy contract as the image/audio gradients (both id bytes
    multiply (f, x, y)-varying factors; +500k copies bump the first
    16 frames inside the modulus)."""
    if i >= 1_000_000:
        base, bump = i - 1_000_000, 0
    elif i >= 500_000:
        base = i - 500_000
        bump = 5 if f < 16 else 0
    else:
        base, bump = i, 0
    lo, hi = base % 256, (base // 256) % 256
    return (
        lo * ((f + 1) * (x + 2) + y)
        + hi * (f + 3 * x + 5 * y + 7)
        + f * f + x + bump
    ) % 256


def synth_gradient_y4m_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 65-frame 4x2 C444 Y4M clip per row with
    NON-constant luma planes (the flat ``synth_y4m_blobs`` fixture
    would fingerprint degenerately)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        # the per-pixel formula vectorized over the (frame, y, x) grid
        # (bench: the scalar triple loop made this the 2nd-slowest
        # entry at 4.6 s; pinned == gradient_luma by the decode test)
        f = np.arange(VFP_FRAMES).reshape(-1, 1, 1)
        y = np.arange(VFP_H).reshape(1, -1, 1)
        x = np.arange(VFP_W).reshape(1, 1, -1)
        header = (
            f"YUV4MPEG2 W{VFP_W} H{VFP_H} F25:1 Ip A1:1 C444\n"
            .encode("ascii")
        )
        marker = np.frombuffer(b"FRAME\n", dtype=np.uint8)
        chroma = np.full((VFP_W * VFP_H) * 2, 128, dtype=np.uint8)

        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                if not 0 <= i < 1_500_000:
                    raise ValueError(
                        f"gradient id {i} outside the namespace contract"
                    )
                if i >= 1_000_000:
                    base, bump = i - 1_000_000, 0
                elif i >= 500_000:
                    base = i - 500_000
                    bump = np.where(f < 16, 5, 0)
                else:
                    base, bump = i, 0
                lo, hi = base % 256, (base // 256) % 256
                lum = (
                    lo * ((f + 1) * (x + 2) + y)
                    + hi * (f + 3 * x + 5 * y + 7)
                    + f * f + x + bump
                ) % 256
                frames = np.concatenate(
                    [
                        np.concatenate(
                            [marker, lum[k].astype(np.uint8).ravel(), chroma]
                        )
                        for k in range(VFP_FRAMES)
                    ]
                )
                blobs.append(header + frames.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": blobs,
                    "media_type": "video/x-yuv4mpeg",
                }
            )

    return df.select(id_col).mapInPandas(
        run, "media_id long, content binary, media_type string"
    )


def video_luma_fingerprint(df: DataFrame) -> DataFrame:
    """64-bit luma-contour fingerprint per clip from REAL Y4M byte
    parsing: bit(f) = [S(f+1) > S(f)] where S(f) is the exact integer
    luma-plane sum of frame f — hex16-packed so
    ``dedup_docs.hex_hamming_pairs`` serves video exactly as it does
    text, image and audio. Wrong geometry / colorspace / truncated
    streams quarantine to NULL."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        npx = VFP_W * VFP_H
        stride = 6 + npx * 3  # b"FRAME\n" + Y + U + V

        def one(content) -> Optional[str]:
            try:
                buf = bytes(content)
                nl = buf.index(b"\n")
                head = buf[:nl].decode("ascii")
                if not head.startswith("YUV4MPEG2"):
                    return None
                params = dict(
                    (p[0], p[1:]) for p in head.split(" ")[1:] if p
                )
                w, h = int(params["W"]), int(params["H"])
                if (w, h) != (VFP_W, VFP_H) or params.get("C") != "444":
                    return None
                body = np.frombuffer(buf, dtype=np.uint8, offset=nl + 1)
                if body.size != VFP_FRAMES * stride:
                    return None
                grid = body.reshape(VFP_FRAMES, stride)
                # every frame must open with the marker (vectorized
                # form of the per-frame startswith check)
                marker = np.frombuffer(b"FRAME\n", dtype=np.uint8)
                if not (grid[:, :6] == marker).all():
                    return None
                sums = grid[:, 6:6 + npx].astype(np.int64).sum(axis=1)
                bits = (sums[1:] > sums[:-1]).astype(np.uint64)
                val = 0
                for b in bits.tolist():
                    val = (val << 1) | int(b)
                return f"{val:016x}"
            except (ValueError, KeyError, UnicodeDecodeError, TypeError):
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "vfp": [one(c) for c in pdf["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, "media_id long, vfp string"
    )
