"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata columns
alongside.  PNG, GIF, WAV and baseline JPEG decode are REAL and
pure-stdlib here — :func:`png_decode` (chunk walk → zlib inflate →
scanline unfilter), :func:`wav_decode` (RIFF walk → PCM samples), the
GIF LZW decoder, and :func:`functions.jpeg.jpeg_decode` (huffman +
dequant + IDCT) — so ``DecodeStage`` / ``ResizeStage`` process real
byte streams with no codec dependency.  Formats still needing a true
codec (progressive JPEG, MP3, MP4 video pixels) stay gated: PIL if
installed, else ``NotImplementedError``; ``fake=True`` keeps the
deterministic byte-histogram stub for codec-free plumbing tests.

Scale notes: binary payloads are MBs per row → run these stages with small
``batch_size`` (16-64) so batch × concurrency fits worker heaps, and let
blocks split (SURVEY §7.5 hard part 7 applies identically to html pages).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from .. import runtime_env

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",  # (or avi; fine for sniffing demo)
    b"ID3": "audio/mp3",
    b"<!DO": "text/html",
    b"<htm": "text/html",
}


def binary_metadata_batch(batch: pa.Table, binary_column: str = "payload") -> pa.Table:
    """Attach (n_bytes, sniffed_type) metadata for a binary column."""
    payloads = batch.column(binary_column).to_pylist()
    sizes, types = [], []
    for b in payloads:
        b = b or b""
        sizes.append(len(b))
        kind = "application/octet-stream"
        for magic, name in _MAGIC.items():
            if b.startswith(magic):
                kind = name
                break
        types.append(kind)
    out = {n: batch.column(n) for n in batch.column_names}
    out["n_bytes"] = pa.array(sizes, pa.int64())
    out["sniffed_type"] = pa.array(types, pa.string())
    return pa.table(out)


# SOF markers carrying frame dimensions: C0–CF except C4 (DHT),
# C8 (JPG extension) and CC (DAC) — the JPEG/JFIF marker contract.
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def image_dims(blob: bytes):
    """``(fmt, width, height)`` parsed from an image CONTAINER header —
    PNG IHDR (big-endian, fixed offset after the 8-byte signature),
    GIF logical screen descriptor (LITTLE-endian — the classic parser
    bug this function's tests pin), and the JPEG marker WALK: segments
    are (0xFF, marker, 2-byte big-endian length-including-itself)
    records that must be skipped until a SOF frame header, whose
    payload is (precision u8, height u16, width u16) — height FIRST,
    the other classic bug.  Pure byte parsing, stdlib struct only — no
    codec import, so this runs on any worker (the decode-to-pixels
    stage stays behind the documented codec stub; DIMENSIONS are
    container metadata and never needed a codec).  Returns
    ``("unknown", -1, -1)`` for unrecognized or truncated payloads."""
    import struct

    b = blob or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        if len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return "png", int(w), int(h)
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", int(w), int(h)
    elif b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(b):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seglen
        return "jpeg", -1, -1  # valid SOI but no parseable frame
    return "unknown", -1, -1


def wav_meta(blob: bytes):
    """``(channels, sample_rate, bits, duration_ms)`` from a RIFF/WAVE
    container — the chunk WALK: ``RIFF`` + u32le size + ``WAVE``, then
    (fourcc, u32le length) chunks skipped until ``fmt `` (channels
    u16le, sample rate u32le, bits-per-sample u16le at offset 14) and
    ``data`` (payload length = the audio byte count); chunks pad to
    even lengths (the RIFF rule a naive walker misses on odd-length
    chunks).  Duration is the exact floor
    ``data_bytes · 8000 // (rate · channels · bits)`` ms — integer end
    to end.  Pure stdlib struct, no codec (the audio twin of
    :func:`image_dims`: a corpus filter on duration/sample-rate must
    not decode 100 TB of audio).  Returns ``(-1, -1, -1, -1)`` when
    not a parseable WAVE."""
    import struct

    b = blob or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return -1, -1, -1, -1
    ch = rate = bits = -1
    data_len = -1
    i = 12
    while i + 8 <= len(b):
        fourcc = b[i:i + 4]
        clen = struct.unpack("<I", b[i + 4:i + 8])[0]
        if fourcc == b"fmt " and i + 8 + 16 <= len(b):
            ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif fourcc == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # RIFF pads odd chunks to even
    if ch <= 0 or rate <= 0 or bits <= 0 or data_len < 0:
        return -1, -1, -1, -1
    return (int(ch), int(rate), int(bits),
            int(data_len) * 8000 // (int(rate) * int(ch) * int(bits)))


def mp4_meta(blob: bytes):
    """``(brand, timescale, duration_ms)`` from an ISO-BMFF (MP4)
    container — the box WALK with NESTING: top-level boxes are
    (u32be size-including-header, fourcc) records; ``moov`` is a
    CONTAINER whose children walk recursively until ``mvhd``, whose
    version-0 payload carries timescale u32be at offset 12 and
    duration (in timescale units) u32be at 16 (version 1: u64be at
    16/20 — both handled; the version byte is the classic miss).
    ``size == 1`` means a u64be largesize follows the fourcc (the
    >4 GiB convention — handled, the other classic miss).  Duration
    is the exact floor ``duration · 1000 // timescale`` ms.  Pure
    stdlib struct; the video twin of :func:`image_dims` /
    :func:`wav_meta`.  Returns ``("", -1, -1)`` when not parseable."""
    import struct

    b = blob or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return "", -1, -1
    brand = b[8:12].decode("ascii", errors="replace")

    def find_mvhd(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i:i + 4])[0]
            four = b[i + 4:i + 8]
            payload = i + 8
            if size == 1:  # 64-bit largesize follows the fourcc
                if i + 16 > hi:
                    return None
                size = struct.unpack(">Q", b[i + 8:i + 16])[0]
                payload = i + 16
            if size < 8 or i + size > hi:
                return None
            if four == b"moov":
                found = find_mvhd(payload, i + size)
                if found is not None:
                    return found
            elif four == b"mvhd":
                version = b[payload]
                if version == 1 and payload + 32 <= hi:
                    ts = struct.unpack(">I", b[payload + 20:
                                               payload + 24])[0]
                    dur = struct.unpack(">Q", b[payload + 24:
                                                payload + 32])[0]
                    return ts, dur
                if version == 0 and payload + 20 <= hi:
                    ts, dur = struct.unpack(
                        ">II", b[payload + 12:payload + 20])
                    return ts, dur
                return None
            i += size
        return None

    found = find_mvhd(0, len(b))
    if not found or found[0] <= 0:
        return brand, -1, -1
    ts, dur = found
    return brand, int(ts), int(dur) * 1000 // int(ts)


def _mp4_box(four: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + four + payload


def _mp4_full(four: bytes, version: int, flags: int,
              payload: bytes) -> bytes:
    import struct

    return _mp4_box(four, struct.pack(">B", version)
                    + struct.pack(">I", flags)[1:] + payload)


def mp4_encode_samples(samples, timescale: int = 1000,
                       sample_delta: int = 40,
                       chunk_size: int = 3,
                       handler: bytes = b"vide",
                       uniform_stsz: bool = False,
                       use_co64: bool = False) -> bytes:
    """Encode sample payloads as a REAL unfragmented MP4 — pure stdlib
    struct: ``ftyp`` + ``mdat`` (samples concatenated in chunk order) +
    ``moov/trak/mdia/minf/stbl`` with a correct sample table —
    variable-size ``stsz``, run-length ``stsc`` (samples grouped into
    chunks of ``chunk_size``, so the demux must honor the
    sample-to-chunk mapping, not assume one sample per chunk), and
    absolute ``stco`` file offsets.  The duration lands in ``mvhd`` /
    ``mdhd`` so :func:`mp4_meta` reads it back."""
    import struct

    n = len(samples)
    duration = n * sample_delta
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512)
                    + b"isomiso2mp41")
    mdat = _mp4_box(b"mdat", b"".join(samples))
    chunks = [samples[i:i + chunk_size]
              for i in range(0, n, chunk_size)] or [[]]
    off = len(ftyp) + 8  # mdat payload begins here
    stco_offsets = []
    for ch in chunks:
        stco_offsets.append(off)
        off += sum(len(s) for s in ch)
    stsc_entries = []
    for i, ch in enumerate(chunks):
        if not stsc_entries or stsc_entries[-1][1] != len(ch):
            stsc_entries.append((i + 1, len(ch)))
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _mp4_box(b"mp4v", b"\x00" * 78))
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">I", 0) if n == 0
                     else struct.pack(">III", 1, n, sample_delta))
    stsc = _mp4_full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                     + b"".join(struct.pack(">III", fc, spc, 1)
                                for fc, spc in stsc_entries))
    if uniform_stsz:
        usz = {len(s) for s in samples} or {0}
        assert len(usz) == 1, "uniform_stsz requires equal-size samples"
        stsz = _mp4_full(b"stsz", 0, 0,
                         struct.pack(">II", usz.pop(), n))
    else:
        stsz = _mp4_full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                         + b"".join(struct.pack(">I", len(s))
                                    for s in samples))
    if use_co64:
        stco = _mp4_full(b"co64", 0, 0,
                         struct.pack(">I", len(stco_offsets))
                         + b"".join(struct.pack(">Q", o)
                                    for o in stco_offsets))
    else:
        stco = _mp4_full(b"stco", 0, 0,
                         struct.pack(">I", len(stco_offsets))
                         + b"".join(struct.pack(">I", o)
                                    for o in stco_offsets))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _mp4_box(b"dinf", _mp4_full(b"dref", 0, 0,
                                       struct.pack(">I", 1)
                                       + _mp4_full(b"url ", 0, 1, b"")))
    vmhd = _mp4_full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    hdlr = _mp4_full(b"hdlr", 0, 0, b"\x00" * 4 + handler
                     + b"\x00" * 12 + b"h\x00")
    mdhd = _mp4_full(b"mdhd", 0, 0,
                     struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">HH", 0x55C4, 0))
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    tkhd = _mp4_full(b"tkhd", 0, 7, struct.pack(">III", 0, 0, 1)
                     + b"\x00" * 4 + struct.pack(">I", duration)
                     + b"\x00" * 52)
    trak = _mp4_box(b"trak", tkhd + mdia)
    mvhd = _mp4_full(b"mvhd", 0, 0,
                     struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">I", 0x00010000) + b"\x00" * 76)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _mp4_iter_boxes(b: bytes, lo: int, hi: int):
    import struct

    i = lo
    while i + 8 <= hi:
        size = struct.unpack(">I", b[i:i + 4])[0]
        four = b[i + 4:i + 8]
        payload = i + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if i + 16 > hi:
                return
            size = struct.unpack(">Q", b[i + 8:i + 16])[0]
            payload = i + 16
        elif size == 0:  # box extends to the end of the scope
            size = hi - i
        if size < 8 or i + size > hi:
            return
        yield four, payload, i + size
        i += size


def _mp4_find(b: bytes, lo: int, hi: int, four: bytes):
    for f, plo, phi in _mp4_iter_boxes(b, lo, hi):
        if f == four:
            return plo, phi
    return None


def mp4_samples(blob: bytes, prefer_handler: bytes = b"vide"):
    """REAL MP4 demux, pure stdlib: per-sample ``(offset, size)`` byte
    ranges of the preferred track via the full sample-table walk —
    ``stsz`` sizes (uniform or per-sample), ``stsc`` run-length
    sample-to-chunk mapping (1-based first_chunk runs — the part naive
    demuxers skip), and ``stco``/``co64`` chunk offsets; samples lay
    consecutively within a chunk.  Track selection prefers the first
    ``hdlr`` handler match (``vide``), else the first trak.  This is a
    container DEMUX, not a codec: frame/sample BYTES come out, pixel
    decode stays behind the codec gate — exactly what uniform temporal
    frame sampling over 100 TB of video needs (read the stbl, seek the
    sampled ranges, never touch the rest).  Raises ``ValueError`` when
    not parseable ISO-BMFF."""
    import struct

    b = blob or b""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    moov = _mp4_find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    traks = [(plo, phi) for f, plo, phi in _mp4_iter_boxes(b, *moov)
             if f == b"trak"]
    if not traks:
        raise ValueError("no trak box")

    def handler_of(tlo, thi):
        mdia = _mp4_find(b, tlo, thi, b"mdia")
        if mdia is None:
            return b""
        hdlr = _mp4_find(b, *mdia, b"hdlr")
        return b[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b""

    pick = next(((lo, hi) for lo, hi in traks
                 if handler_of(lo, hi) == prefer_handler), traks[0])
    mdia = _mp4_find(b, *pick, b"mdia")
    minf = _mp4_find(b, *mdia, b"minf") if mdia else None
    stbl = _mp4_find(b, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("no stbl box")
    stsz = _mp4_find(b, *stbl, b"stsz")
    stsc = _mp4_find(b, *stbl, b"stsc")
    stco = _mp4_find(b, *stbl, b"stco")
    width = 4
    if stco is None:
        stco = _mp4_find(b, *stbl, b"co64")
        width = 8
    if stsz is None or stsc is None or stco is None:
        raise ValueError("incomplete sample table")

    z = stsz[0]
    uniform, count = struct.unpack(">II", b[z + 4:z + 12])
    if uniform:
        sizes = np.full(count, uniform, np.int64)
    else:
        sizes = np.frombuffer(b, ">u4", count, z + 12).astype(np.int64)

    c = stco[0]
    n_chunks = struct.unpack(">I", b[c + 4:c + 8])[0]
    dt = ">u4" if width == 4 else ">u8"
    offsets = np.frombuffer(b, dt, n_chunks, c + 8).astype(np.int64)

    s = stsc[0]
    n_runs = struct.unpack(">I", b[s + 4:s + 8])[0]
    runs = np.frombuffer(b, ">u4", n_runs * 3, s + 8).astype(
        np.int64).reshape(n_runs, 3)

    spc = np.empty(n_chunks, np.int64)
    for r in range(n_runs):
        first = int(runs[r, 0]) - 1
        last = int(runs[r + 1, 0]) - 1 if r + 1 < n_runs else n_chunks
        spc[first:last] = runs[r, 1]

    out = []
    si = 0
    for ci in range(n_chunks):
        off = int(offsets[ci])
        for _ in range(int(spc[ci])):
            if si >= count:
                break
            out.append((off, int(sizes[si])))
            off += int(sizes[si])
            si += 1
    if si != count:
        raise ValueError(f"sample table mismatch: {si} != {count}")
    return out


def mp4_meta_batch(batch: pa.Table,
                   binary_column: str = "payload") -> pa.Table:
    """map_batches fn: attach ``(brand, timescale, duration_ms)`` via
    :func:`mp4_meta`."""
    payloads = batch.column(binary_column).to_pylist()
    brands, tss, durs = [], [], []
    for b in payloads:
        br, ts, d = mp4_meta(b)
        brands.append(br)
        tss.append(ts)
        durs.append(d)
    out = {n: batch.column(n) for n in batch.column_names}
    out["brand"] = pa.array(brands, pa.string())
    out["timescale"] = pa.array(tss, pa.int64())
    out["duration_ms"] = pa.array(durs, pa.int64())
    return pa.table(out)


def wav_meta_batch(batch: pa.Table,
                   binary_column: str = "payload") -> pa.Table:
    """map_batches fn: attach ``(channels, sample_rate, bits,
    duration_ms)`` via :func:`wav_meta`."""
    payloads = batch.column(binary_column).to_pylist()
    cols = {"channels": [], "sample_rate": [], "bits": [],
            "duration_ms": []}
    for b in payloads:
        c, r, bt, d = wav_meta(b)
        cols["channels"].append(c)
        cols["sample_rate"].append(r)
        cols["bits"].append(bt)
        cols["duration_ms"].append(d)
    out = {n: batch.column(n) for n in batch.column_names}
    for k, v in cols.items():
        out[k] = pa.array(v, pa.int64())
    return pa.table(out)


def image_dims_batch(batch: pa.Table,
                     binary_column: str = "payload") -> pa.Table:
    """map_batches fn: attach ``(fmt, width, height)`` via
    :func:`image_dims` — per-row header parsing is O(header bytes),
    the same cost class as the magic sniff above."""
    payloads = batch.column(binary_column).to_pylist()
    fmts, ws, hs = [], [], []
    for b in payloads:
        f, w, h = image_dims(b)
        fmts.append(f)
        ws.append(w)
        hs.append(h)
    out = {n: batch.column(n) for n in batch.column_names}
    out["fmt"] = pa.array(fmts, pa.string())
    out["width"] = pa.array(ws, pa.int64())
    out["height"] = pa.array(hs, pa.int64())
    return pa.table(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA
_PNG_CTYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _png_chunk(four: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + four + data
            + struct.pack(">I", zlib.crc32(four + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray, filters=None) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, c)`` uint8 raster as a real,
    spec-conformant PNG — pure stdlib (zlib deflate + CRC32), 8-bit,
    non-interlaced, color type from the channel count (1→gray, 2→gray+
    alpha, 3→RGB, 4→RGBA).  ``filters`` optionally gives the per-row
    filter type (int, sequence, or ``f(y) -> 0..4``); default 0 (None).
    Varying the filter per row is the point for tests: a decoder must
    invert Sub/Up/Average/Paeth, not just memcpy."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint8)
    bpp = ch  # 8-bit samples → bytes-per-pixel == channels
    pick = (filters if callable(filters)
            else (lambda y: filters[y]) if hasattr(filters, "__getitem__")
            else (lambda y: int(filters)) if filters is not None
            else (lambda y: 0))
    lines = []
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = int(pick(y))
        if f == 0:
            enc = cur
        elif f == 1:  # Sub: x - a
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - a
        elif f == 2:  # Up: x - b
            enc = cur - prev
        elif f == 3:  # Average: x - (a + b)//2
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - (a + prev) // 2
        elif f == 4:  # Paeth
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + prev - c
            pa_, pb_, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                            np.where(pb_ <= pc_, prev, c))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(bytes([f]) + (enc & 255).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_CTYPE[ch], 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def png_decode(blob: bytes) -> np.ndarray:
    """REAL PNG decode, pure stdlib: chunk walk → zlib inflate →
    per-scanline UNfilter (None/Sub/Up/Average/Paeth — the spec's §9
    recurrences on the ints-then-mod-256 rule) → ``(h, w, c)`` uint8.
    Supports 8-bit depth, color types 0/2/4/6, non-interlaced — the
    shapes a training-data corpus normalizes to anyway; anything else
    raises ``NotImplementedError`` (palette/16-bit/interlace), bad
    signature/structure raises ``ValueError``.  Sub is vectorized as a
    per-channel cumsum; Average/Paeth keep the inherently sequential
    intra-row dependency as a per-PIXEL (not per-byte) loop over
    channel vectors — the stage parallelizes across dataset rows via
    the actor pool, not within one image."""
    import struct
    import zlib

    b = blob or b""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w = h = depth = ctype = interlace = None
    idat = []
    i = 8
    while i + 8 <= len(b):
        clen = struct.unpack(">I", b[i:i + 4])[0]
        four = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + clen]
        if four == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif four == b"IDAT":
            idat.append(data)
        elif four == b"IEND":
            break
        i += 12 + clen
    if w is None:
        raise ValueError("no IHDR")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png depth={depth} ctype={ctype} interlace={interlace}")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            cur = np.cumsum(line.reshape(w, ch), axis=0).reshape(-1) & 255
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f == 3:  # Average — sequential in a, vector over channels
            cur = line
            a = np.zeros(ch, np.int32)
            pv = prev.reshape(w, ch)
            cw = cur.reshape(w, ch)
            for x in range(w):
                a = (cw[x] + (a + pv[x]) // 2) & 255
                cw[x] = a
        elif f == 4:  # Paeth
            cur = line
            a = np.zeros(ch, np.int32)
            c = np.zeros(ch, np.int32)
            pv = prev.reshape(w, ch)
            cw = cur.reshape(w, ch)
            for x in range(w):
                bb = pv[x]
                p = a + bb - c
                pa_, pb_, pc_ = np.abs(p - a), np.abs(p - bb), np.abs(p - c)
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                                np.where(pb_ <= pc_, bb, c))
                a = (cw[x] + pred) & 255
                cw[x] = a
                c = bb
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)
    return out.reshape(h, w, ch)


def png_luma(img: np.ndarray) -> np.ndarray:
    """Deterministic integer luma for a decoded raster: gray planes pass
    through; RGB(A) uses the exact BT.601 integer rule
    ``(299·R + 587·G + 114·B) // 1000`` (alpha ignored)."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c <= 2:
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def _gif_lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width starting at
    ``min_code_size+1``, LSB-first bit packing, CLEAR emitted at start
    and on a full (4096-entry) dictionary — the standard width-bump
    rule (grow when the next assignable code reaches ``1<<width``)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w: tuple = ()
    for k in indices.tolist():
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_gif_lzw_encode` — including the KwKwK rule
    (a code equal to the next assignable entry expands to
    ``prev + prev[0]``) and the deferred-clear reset."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: best-effort
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY width bump: the decoder's table lags the encoder's
            # by one entry (the encoder assigns after every emitted
            # code, the decoder appends from the second code on), so
            # the width grows when the ENCODER's count — len(table)+1 —
            # reaches 1<<width.  The classic off-by-one every naive
            # GIF decoder hits.
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def gif_encode(img: np.ndarray, palette: "np.ndarray | None" = None
               ) -> bytes:
    """Encode an ``(h, w)`` uint8 index raster as a real GIF89a —
    pure stdlib + the LZW above; 256-entry color table (default
    grayscale identity palette), non-interlaced."""
    import struct

    h, w = img.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    pal = np.zeros((256, 3), np.uint8)
    pal[:len(palette)] = palette[:256]
    lzw = _gif_lzw_encode(np.ascontiguousarray(img, np.uint8).reshape(-1),
                          8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (b"GIF89a" + struct.pack("<HH", w, h)
            + b"\xf7\x00\x00"          # GCT present, 256 entries
            + pal.tobytes()
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + b"\x08" + bytes(blocks)  # min code size 8
            + b"\x3b")                 # trailer


def gif_decode(blob: bytes):
    """REAL GIF decode, pure stdlib: header + color tables + extension
    skip + the first image descriptor's LZW stream →
    ``(indices (h, w) uint8, palette (n, 3) uint8)``.  Non-interlaced
    8-bit images (the shape a training corpus normalizes to);
    interlaced images raise ``NotImplementedError``, non-GIF bytes
    ``ValueError``."""
    import struct

    b = blob or b""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags = struct.unpack("<HHB", b[6:11])
    i = 13
    palette = np.zeros((256, 3), np.uint8)
    if flags & 0x80:  # global color table
        n = 2 << (flags & 7)
        palette[:n] = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(b):
        marker = b[i]
        if marker == 0x21:  # extension: skip sub-blocks
            i += 2
            while i < len(b) and b[i]:
                i += 1 + b[i]
            i += 1
        elif marker == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack("<HHHHB", b[i + 1:i + 10])
            i += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF")
            if iflags & 0x80:  # local color table overrides
                n = 2 << (iflags & 7)
                palette[:n] = np.frombuffer(
                    b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            mcs = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i]:
                ln = b[i]
                data += b[i + 1:i + 1 + ln]
                i += 1 + ln
            i += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(data), mcs), np.uint8)
            if len(idx) < h * w:
                raise ValueError("GIF pixel data truncated")
            return idx[:h * w].reshape(h, w), palette
        elif marker == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block marker {marker:#x}")
    raise ValueError("no image descriptor")


def wav_encode(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Encode int16 PCM as a real RIFF/WAVE container — ``samples`` is
    flat interleaved (frame-major) int16; pure stdlib struct."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_decode(blob: bytes):
    """REAL WAV decode, pure stdlib: the :func:`wav_meta` chunk walk
    plus the ``data`` payload parsed to samples.  Returns ``(samples,
    rate, channels)`` with ``samples`` a flat interleaved numpy array —
    int16 for 16-bit PCM, uint8 for 8-bit.  Raises ``ValueError`` on a
    non-WAVE container, ``NotImplementedError`` for non-PCM or other
    bit depths."""
    import struct

    b = blob or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    ch = rate = bits = audio_fmt = -1
    data = None
    i = 12
    while i + 8 <= len(b):
        fourcc = b[i:i + 4]
        clen = struct.unpack("<I", b[i + 4:i + 8])[0]
        if fourcc == b"fmt " and i + 8 + 16 <= len(b):
            audio_fmt, ch, rate = struct.unpack("<HHI", b[i + 8:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif fourcc == b"data":
            data = b[i + 8:i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if data is None or ch <= 0 or rate <= 0:
        raise ValueError("missing fmt /data chunk")
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(f"wav fmt={audio_fmt} bits={bits}")
    if bits == 16:
        samples = np.frombuffer(data[:len(data) & ~1], dtype="<i2")
    else:
        samples = np.frombuffer(data, dtype=np.uint8)
    return samples, int(rate), int(ch)


def dhash64(img: np.ndarray):
    """64-bit DIFFERENCE HASH (perceptual image fingerprint, the
    standard near-dup-image bucketing key): pixel-center
    nearest-neighbor resample of the luma raster to 8 rows × 9 cols
    with the PURE-INTEGER index rule ``ry = min((2r+1)·h // 16, h−1)``
    / ``rx = min((2c+1)·w // 18, w−1)`` (integer end to end so a SQL
    engine reproduces it exactly — no float resize), then bit
    ``(r, c) = 1 iff px[r,c] < px[r,c+1]``, packed row-major at bit
    index ``r·8 + c``.  Returns ``(hi, lo)`` int64 halves (bits 32-63
    / 0-31) — two signed columns instead of one overflowing uint64.
    Invariant to uniform brightness shifts (no clipping) and to any
    resize that preserves the 8×9 sample grid's orderings."""
    h, w = img.shape[:2]
    if img.ndim == 3:
        img = png_luma(img)
    ry = np.minimum((2 * np.arange(8, dtype=np.int64) + 1) * h // 16,
                    h - 1)
    rx = np.minimum((2 * np.arange(9, dtype=np.int64) + 1) * w // 18,
                    w - 1)
    g = img[np.ix_(ry, rx)].astype(np.int64)
    bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64)
    idx = (np.arange(8, dtype=np.uint64)[:, None] * np.uint64(8)
           + np.arange(8, dtype=np.uint64)[None, :])
    packed = int((bits << idx).sum(dtype=np.uint64))
    return (packed >> 32) & 0xFFFFFFFF, packed & 0xFFFFFFFF


class SpectrogramStage:
    """Actor-pool audio spectral-feature stage — REAL DSP, no stub:
    WAV payloads decode via the stdlib :func:`wav_decode`, channel 0
    frames into non-overlapping (default) rectangular windows of
    ``n_fft`` samples, and each frame's magnitude spectrum is
    ``|rfft|``; the emitted features are the frame count, the dominant
    bin of the mean magnitude spectrum, and its frequency in Hz
    (``bin · rate // n_fft``, exact integer).  The rectangular window
    keeps exact-bin tones leakage-free, so a pure tone at
    ``k · rate / n_fft`` Hz lands its dominant bin at exactly ``k`` —
    what the SQL oracle of the audio_spectral query pins (the FFT
    itself has no SQL form; the BIN of a planted exact-bin tone
    does)."""

    def __init__(self, binary_column: str = "payload",
                 n_fft: int = 512, hop: int | None = None,
                 per_frame: bool = False) -> None:
        self._col = binary_column
        self._n = n_fft
        self._hop = hop or n_fft
        self._per_frame = per_frame

    def _spectra(self, payload: bytes):
        samples, rate, ch = wav_decode(payload)
        mono = samples.reshape(-1, ch)[:, 0].astype(np.float64)
        n = self._n
        if len(mono) < n:
            return None, rate
        n_frames = 1 + (len(mono) - n) // self._hop
        starts = np.arange(n_frames) * self._hop
        frames = mono[starts[:, None] + np.arange(n)[None, :]]
        return np.abs(np.fft.rfft(frames, axis=1)), rate

    def _features(self, payload: bytes):
        mags, rate = self._spectra(payload)
        if mags is None:
            return 0, -1, -1
        dominant = int(mags.mean(axis=0).argmax())
        return len(mags), dominant, dominant * rate // self._n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {n: batch.column(n) for n in batch.column_names
               if n != self._col}
        if self._per_frame:
            # per-frame dominant bins: the spectral FINGERPRINT column
            # (audio near-dup bucketing; amplitude-invariant)
            bins_out = []
            for b in batch.column(self._col).to_pylist():
                mags, _rate = self._spectra(b)
                bins_out.append(
                    [] if mags is None
                    else mags.argmax(axis=1).astype(np.int64).tolist())
            out["frame_bins"] = pa.array(bins_out, pa.list_(pa.int64()))
            return pa.table(out)
        nf, db, dh = [], [], []
        for b in batch.column(self._col).to_pylist():
            a, bb, c = self._features(b)
            nf.append(a)
            db.append(bb)
            dh.append(c)
        out["n_frames"] = pa.array(nf, pa.int64())
        out["dominant_bin"] = pa.array(db, pa.int64())
        out["dominant_hz"] = pa.array(dh, pa.int64())
        return pa.table(out)


N_FEATURES = 16


class DecodeStage:
    """Actor-pool decode / feature-extract stage for binary payloads.

    * ``fake=False`` (default) → REAL decode: PNG payloads run the
      pure-stdlib :func:`png_decode` (zlib inflate + scanline unfilter)
      → integer luma → N_FEATURES-bin pixel-intensity histogram;
      RIFF/WAVE payloads run :func:`wav_decode` → int16 PCM mapped to
      8-bit amplitude → the same histogram.  Other formats fall through
      to PIL if installed (a richer environment; the handle is loaded
      ONCE per actor in ``__init__``), else ``NotImplementedError``
      (JPEG/MP3 codecs are not shipped here).
    * ``fake=True`` → deterministic 16-bin byte histogram, L1-normalized,
      as the "feature vector" — exercises the full actor-pool plumbing
      without paying for decode.
    """

    def __init__(self, binary_column: str = "payload", fake: bool = False) -> None:
        self._col = binary_column
        self._fake = fake
        # real codecs load HERE, once per actor (import-gated)
        self._pil = None
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None
        self._bins = np.linspace(0, 256, N_FEATURES + 1)

    def _hist(self, arr: np.ndarray) -> np.ndarray:
        hist, _ = np.histogram(arr, bins=self._bins)
        return (hist / max(1, hist.sum())).astype(np.float32)

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._fake:
            return self._hist(np.frombuffer(payload or b"\x00",
                                            dtype=np.uint8))
        b = payload or b""
        if b[:8] == _PNG_SIG:
            return self._hist(png_luma(png_decode(b)).ravel())
        if b[:6] in (b"GIF87a", b"GIF89a"):
            idx, pal = gif_decode(b)
            p = pal.astype(np.int64)  # uint8 products overflow (NEP 50)
            lum = ((299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2])
                   // 1000).astype(np.uint8)
            return self._hist(lum[idx.ravel()])
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            samples, _rate, _ch = wav_decode(b)
            if samples.dtype != np.uint8:  # int16 → 8-bit amplitude
                samples = ((samples.astype(np.int32) + 32768) >> 8)
            return self._hist(samples.astype(np.uint8))
        if b[:2] == b"\xff\xd8":
            # baseline sequential JPEG decodes for real (functions.jpeg);
            # progressive/arithmetic frames raise NotImplementedError
            # from the codec itself — the honest gate moves down a level
            from .jpeg import jpeg_decode

            arr = jpeg_decode(b)
            if arr.ndim == 3:  # RGB → integer luma (the GIF-path rule)
                p = arr.astype(np.int64)
                arr = ((299 * p[..., 0] + 587 * p[..., 1]
                        + 114 * p[..., 2]) // 1000).astype(np.uint8)
            return self._hist(arr.ravel())
        if self._pil is None:
            raise NotImplementedError(
                "no stdlib decoder for this format (PNG/GIF/WAV/baseline "
                "JPEG supported) and no codec library installed; "
                "construct DecodeStage(fake=True) for the deterministic "
                "stub"
            )
        import io

        img = self._pil.open(io.BytesIO(b)).convert("L")
        return self._hist(np.asarray(img, dtype=np.uint8).ravel())

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(b) for b in batch.column(self._col).to_pylist()]
        out = {n: batch.column(n) for n in batch.column_names if n != self._col}
        out["features"] = pa.array(
            [f.tolist() for f in feats], pa.list_(pa.float32(), N_FEATURES)
        )
        return pa.table(out)


def decode_features(
    ds,
    binary_column: str = "payload",
    fake: bool = False,
    batch_size: int = 32,
    concurrency=(1, 8),
):
    """Run the decode stage as an actor pool with payload-appropriate
    batch sizing."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_args=(binary_column, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        runtime_env=runtime_env(),
    )


class FrameSampleStage:
    """Actor-pool video frame-sampling stage.

    Contract: binary "video" column in → ``frames`` (``list<binary>``,
    ≤ ``n_frames`` uniformly-spaced samples), ``n_total_frames`` and
    ``frame_indices`` out.  With ``fake=False`` (default) MP4 payloads
    demux for REAL via the pure-stdlib :func:`mp4_samples` sample-table
    walk (stsz/stsc/stco) — frame BYTES, no codec decode — and other
    formats raise ``NotImplementedError``.  With ``fake=True`` the
    payload is treated as a fixed-size-frame container (``frame_bytes``
    per frame, trailing partial frame dropped) — the codec-free
    plumbing path."""

    def __init__(self, binary_column: str = "payload", n_frames: int = 4,
                 frame_bytes: int = 256, fake: bool = False) -> None:
        self._col = binary_column
        self._n = n_frames
        self._fb = frame_bytes
        self._fake = fake
        # a real demuxer (ffmpeg/PyAV handle) would be opened HERE,
        # once per actor

    def _split_frames(self, payload: bytes) -> list:
        if not self._fake:
            b = payload or b""
            if len(b) >= 12 and b[4:8] == b"ftyp":
                return [b[o:o + s] for o, s in mp4_samples(b)]
            raise NotImplementedError(
                "no stdlib demux for this format (MP4 supported); "
                "construct FrameSampleStage(fake=True) for the "
                "fixed-size-frame stub"
            )
        n = len(payload or b"") // self._fb
        return [payload[i * self._fb:(i + 1) * self._fb] for i in range(n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_out, totals, idx_out = [], [], []
        for b in batch.column(self._col).to_pylist():
            frames = self._split_frames(b)
            total = len(frames)
            if total <= self._n:
                pick = np.arange(total)
            else:
                # uniform temporal sampling — deterministic midpoints
                pick = ((np.arange(self._n) * total) // self._n)
            frames_out.append([frames[i] for i in pick])
            totals.append(total)
            idx_out.append(pick.astype(np.int64).tolist())
        out = {n: batch.column(n) for n in batch.column_names
               if n != self._col}
        out["frames"] = pa.array(frames_out, pa.list_(pa.large_binary()))
        out["n_total_frames"] = pa.array(totals, pa.int64())
        out["frame_indices"] = pa.array(idx_out, pa.list_(pa.int64()))
        return pa.table(out)


def frame_sample(
    ds,
    binary_column: str = "payload",
    n_frames: int = 4,
    frame_bytes: int = 256,
    fake: bool = False,
    batch_size: int = 16,
    concurrency=(1, 8),
):
    """Run frame sampling as an actor pool (video rows are the largest
    payloads — smallest default batch size of the multimodal stages)."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(binary_column, n_frames, frame_bytes, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        runtime_env=runtime_env(),
    )


class ResizeStage:
    """Actor-pool image-resize stage.

    Contract: binary "image" column in → ``pixels`` (``large_binary``,
    the resized ``out_h × out_w`` uint8 raster) + ``src_h``/``src_w``
    metadata out.  With ``fake=False`` (default) PNG payloads decode
    for REAL via the pure-stdlib :func:`png_decode` → integer luma;
    other formats raise ``NotImplementedError`` (no JPEG codec here).
    With ``fake=True`` the payload bytes are reinterpreted as a
    square-ish uint8 grayscale raster (the codec-free plumbing path).
    The RESIZE itself — nearest-neighbor via two integer index gathers
    — is identical either way."""

    def __init__(self, binary_column: str = "payload", out_h: int = 16,
                 out_w: int = 16, fake: bool = False) -> None:
        self._col = binary_column
        self._h, self._w = out_h, out_w
        self._fake = fake
        # a real codec (PIL/turbojpeg handle) would be opened HERE,
        # once per actor; the gather index CACHE below is per-actor too
        self._idx_cache: dict = {}

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self._fake:
            b = payload or b""
            if b[:8] == _PNG_SIG:
                return png_luma(png_decode(b))
            if b[:6] in (b"GIF87a", b"GIF89a"):
                idx, pal = gif_decode(b)
                p = pal.astype(np.int64)
                lum = ((299 * p[:, 0] + 587 * p[:, 1] + 114 * p[:, 2])
                       // 1000).astype(np.uint8)
                return lum[idx]
            raise NotImplementedError(
                "no stdlib decoder for this format (PNG/GIF supported); "
                "construct ResizeStage(fake=True) for the raw-raster stub"
            )
        buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
        w = max(1, int(np.sqrt(len(buf))))
        h = max(1, len(buf) // w)
        return buf[: h * w].reshape(h, w)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        key = (h, w)
        if key not in self._idx_cache:
            # nearest-neighbor sample positions (pixel-center rule)
            ry = ((np.arange(self._h) + 0.5) * h / self._h).astype(np.intp)
            rx = ((np.arange(self._w) + 0.5) * w / self._w).astype(np.intp)
            self._idx_cache[key] = (np.minimum(ry, h - 1),
                                    np.minimum(rx, w - 1))
        ry, rx = self._idx_cache[key]
        return img[ry][:, rx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels, src_h, src_w = [], [], []
        for b in batch.column(self._col).to_pylist():
            img = self._decode(b)
            src_h.append(img.shape[0])
            src_w.append(img.shape[1])
            pixels.append(self._resize(img).tobytes())
        out = {n: batch.column(n) for n in batch.column_names
               if n != self._col}
        out["pixels"] = pa.array(pixels, pa.large_binary())
        out["src_h"] = pa.array(src_h, pa.int64())
        out["src_w"] = pa.array(src_w, pa.int64())
        return pa.table(out)


def resize_images(
    ds,
    binary_column: str = "payload",
    out_h: int = 16,
    out_w: int = 16,
    fake: bool = False,
    batch_size: int = 32,
    concurrency=(1, 8),
):
    """Run the resize stage as an actor pool (image-sized payloads →
    moderate batch size; per-actor gather-index cache warms across
    batches)."""
    return ds.map_batches(
        ResizeStage,
        fn_constructor_args=(binary_column, out_h, out_w, fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        runtime_env=runtime_env(),
    )
