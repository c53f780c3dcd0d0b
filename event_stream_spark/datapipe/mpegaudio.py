"""MPEG-1 Audio Layer I sample codec (ISO 11172-3) — pure numpy.

Closes the one remaining multimodal decode gap the frame-walk metadata
layer (``multimodal.mp3_frame_profile``) left open: actually producing
PCM from an MPEG audio stream so ``audio_pcm_stats`` reports real
RMS/duration/peak for compressed audio, not just WAV.  Reference parity
note: the reference pipeline treats media as opaque bytes + metadata
(SURVEY §2.12 extension surface); this is the Spark-side decode stage a
100 TB multimodal pipeline would run inside ``mapInPandas``.

Scope — honest and deliberate:

- **Layer I** is decoded (and encoded, for fixtures) END-TO-END: its
  entire bit layout is structural (4-bit allocations, 6-bit
  scalefactors with the CLOSED-FORM table ``sf[i] = 2·2^(-i/3)``,
  12×32 linearly-quantized subband samples) — no large tabulated data.
- **Layer II** (round-9) is decoded and encoded end-to-end with the
  B.2a/B.2b allocation tables (structural: three class rows + the
  grouped 3/5/9-level codewords) and the CLOSED-FORM requantizer
  ``s = (2c+1-n)/n`` — which collapses the spec's B.4 C/D two-step
  exactly (for n = 2^k-1 it equals Layer I's constants; for grouped
  classes it reproduces 4/3, 8/5, 16/9 with D=1/2), so no tabulated
  dequant constants were transcribed.  Pinned by encode→decode
  round-trip + spectral parity, the Layer I scheme; bit-exactness vs a
  reference codec is NOT claimed (this container ships no
  twolame/ffmpeg to ground-truth against — same honesty bound as the
  filterbank note below).  The low-rate B.2c/B.2d tables (r10) are
  structural too — one uniform 4-bit class ladder, sblimit 8/12 — and
  round-trip the same way.
- **Layer III** decodes END-TO-END since r11: side information for
  MPEG-1 and MPEG-2 LSF layouts, the BIT RESERVOIR chain, scalefactors
  (scfsi sharing, short/mixed, LSF partitions incl. the wired
  intensity variants), the HUFFMAN SPECTRUM, requantization,
  short-block reorder, alias butterflies, the hybrid 36/12-point IMDCT
  with closed-form sine windows, frequency inversion, and polyphase
  synthesis.  Huffman code tables are ISO 11172-3 Table B.7 constants;
  each SHIPPED table is transcription-verified by exact code-tree
  tiling (distinct + prefix-free + Kraft sum 1 — test-pinned), a joint
  constraint a mis-transcription essentially cannot satisfy.  Tables
  whose transcription could NOT be verified offline are declared and
  raise BY ID at decode (big-value code tables 11, 13, 15, 16→ids
  16-23, 24→ids 24-31) — never silently-wrong audio.  Pinned by
  encode→decode spectral parity (bit-exact ix, closed-form xr), tone
  frequency/gain/purity through the full chain, and the real
  Lavf-encoded system fixture decoding to exact digital silence.
  Intensity-stereo SPECTRUM reconstruction raises (partitioning only);
  MS and L/R stereo decode.
- The polyphase filterbank is a 32-band, 512-tap cosine-modulated
  pseudo-QMF (Vaidyanathan's near-perfect-reconstruction formulation,
  theta_k = (-1)^k * pi/4) with a Kaiser-designed prototype
  (fc = 1.125/128, beta = 8; measured round-trip error 8.9e-4 ≈
  -61 dB, test-enforced).  The ISO Annex-C window is 512 tabulated
  values with no closed form — for energy/duration statistics the
  near-PR bank is equivalent; bit-exactness vs a reference decoder is
  NOT claimed and the docblock says so.

Scale shape: everything here runs inside Arrow-batched ``mapInPandas``
workers — O(samples) numpy per row, zero shuffle, no driver involvement.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from event_stream_spark.datapipe.multimodal import _id3v2_size, _mpa_frame

N_BANDS = 32
TAPS = 512
_DELAY = TAPS - N_BANDS  # analysis+synthesis chain delay in samples

#: Layer I/II scalefactor table — closed form, 63 legal indices
SCALEFACTORS = np.array([2.0 * 2.0 ** (-i / 3.0) for i in range(63)])


@lru_cache(maxsize=1)
def _filterbank() -> tuple[np.ndarray, np.ndarray, float]:
    """(analysis matrix A[32,512] time-reversed, synthesis G[32,512],
    chain gain) for the near-PR pseudo-QMF bank."""
    n = np.arange(TAPS)
    fc = 1.125 / (4 * N_BANDS)
    h = 2 * fc * np.sinc(2 * fc * (n - (TAPS - 1) / 2)) * np.kaiser(TAPS, 8.0)
    k = np.arange(N_BANDS)[:, None]
    theta = ((-1.0) ** np.arange(N_BANDS))[:, None] * np.pi / 4
    arg = np.pi / N_BANDS * (k + 0.5) * (n[None, :] - (TAPS - 1) / 2)
    A = 2 * h[None, :] * np.cos(arg + theta)
    G = 2 * h[None, :] * np.cos(arg - theta)
    # deterministic gain normalization: a unit-RMS noise burst through
    # the chain (the bank is linear, so any broadband probe gives the
    # same scalar)
    rng = np.random.default_rng(12345)
    x = rng.standard_normal(4096)
    S = analysis_frames(x, _mats=(A, G, 1.0))
    y = synthesis_frames(S, _mats=(A, G, 1.0))
    d = _DELAY
    gain = float(np.dot(y[d:d + 2048], x[:2048]) / np.dot(x[:2048], x[:2048]))
    return A, G, gain


def analysis_frames(x: np.ndarray, _mats=None) -> np.ndarray:
    """Mono float signal → subband frames (nf, 32), 32:1 decimated."""
    A, _G, _gain = _mats if _mats is not None else _filterbank()
    nf = (len(x) + N_BANDS - 1) // N_BANDS
    xp = np.concatenate(
        [np.zeros(TAPS - N_BANDS), x, np.zeros(nf * N_BANDS - len(x))]
    )
    idx = np.arange(TAPS)[None, :] + N_BANDS * np.arange(nf)[:, None]
    return xp[idx] @ A[:, ::-1].T


def synthesis_frames(S: np.ndarray, _mats=None) -> np.ndarray:
    """Subband frames (nf, 32) → float signal of nf*32 samples (the
    leading ``_DELAY`` samples are the filter transient; callers that
    encoded with delay padding trim them)."""
    A, G, gain = _mats if _mats is not None else _filterbank()
    nf = S.shape[0]
    out = np.zeros(N_BANDS * nf + TAPS - N_BANDS)
    P = S @ G
    for t in range(nf):
        out[N_BANDS * t:N_BANDS * t + TAPS] += P[t]
    return out[: N_BANDS * nf] / gain


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, total_bytes: int) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        self.buf.extend(b"\x00" * (total_bytes - len(self.buf)))
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            b = self.data[self.bytepos]
            out = (out << 1) | ((b >> (7 - self.bitpos)) & 1)
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return out


# ---------------------------------------------------------------------------
# Layer I frame codec
# ---------------------------------------------------------------------------

_L1_BITRATES = {  # kbps → header index (MPEG1 Layer I)
    32: 1, 64: 2, 96: 3, 128: 4, 160: 5, 192: 6, 224: 7, 256: 8,
    288: 9, 320: 10, 352: 11, 384: 12, 416: 13, 448: 14,
}
_L1_RATES = {44100: 0, 48000: 1, 32000: 2}


def layer1_encode(
    pcm: np.ndarray,
    rate: int,
    channels: int = 1,
    bitrate_kbps: int = 448,
) -> bytes:
    """Float PCM in [-1, 1] (shape (n,) mono or (n, 2) stereo) → MPEG-1
    Layer I stream.  Uniform bit allocation at the largest width the
    frame budget affords; per-subband scalefactors from the closed-form
    table.  The fixture-transcoder for the decode path — and a complete
    encoder in its own right."""
    if rate not in _L1_RATES:
        raise ValueError(f"Layer I encoder supports rates {sorted(_L1_RATES)}")
    if bitrate_kbps not in _L1_BITRATES:
        raise ValueError(f"bitrate {bitrate_kbps} not a Layer I rate")
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.shape[1] != channels:
        raise ValueError("channel count mismatch")
    # delay-compensation padding so decode aligns sample-exact, then
    # round up to whole 384-sample frames
    pcm = np.concatenate([pcm, np.zeros((_DELAY, channels))])
    n = pcm.shape[0]
    n_pad = (-n) % 384
    pcm = np.concatenate([pcm, np.zeros((n_pad, channels))])
    sub = np.stack([analysis_frames(pcm[:, c]) for c in range(channels)])
    # (channels, nf, 32) → group into Layer I frames of 12 subband sets
    nframes = sub.shape[1] // 12

    slots = 12 * bitrate_kbps * 1000 // rate  # exact for the rates above
    frame_bytes = slots * 4
    budget = frame_bytes * 8 - 32 - channels * 32 * 4 - channels * 32 * 6
    nb = min(15, budget // (12 * 32 * channels))
    if nb < 2:
        raise ValueError("bitrate too low for uniform Layer I allocation")
    alloc = nb - 1

    header = (
        (0xFFF << 20) | (0b11 << 19) | (0b11 << 17) | (1 << 16)
        | (_L1_BITRATES[bitrate_kbps] << 12) | (_L1_RATES[rate] << 10)
        | ((0b11 if channels == 1 else 0b00) << 6)
    )
    out = bytearray()
    amax = (1 << nb) - 1
    for f in range(nframes):
        S = sub[:, f * 12:(f + 1) * 12, :]  # (ch, 12, 32)
        w = _BitWriter()
        w.write(header, 32)
        for _sb in range(32):
            for _c in range(channels):
                w.write(alloc, 4)
        # scalefactor selection: largest index whose factor still covers
        # the subband peak (finest quantization step)
        peaks = np.abs(S).max(axis=1)  # (ch, 32)
        sf_idx = np.zeros((channels, 32), dtype=np.int64)
        for c in range(channels):
            for sb in range(32):
                covered = np.nonzero(SCALEFACTORS >= peaks[c, sb] + 1e-12)[0]
                sf_idx[c, sb] = covered[-1] if len(covered) else 0
        for sb in range(32):
            for c in range(channels):
                w.write(int(sf_idx[c, sb]), 6)
        scale = SCALEFACTORS[sf_idx]  # (ch, 32)
        frac = np.clip(S / scale[:, None, :], -1.0, 1.0)
        # inverse of the ISO dequantization (see layer1_decode)
        sppp = frac * (amax / (1 << nb)) - 2.0 ** (1 - nb)
        raw = np.clip(
            np.round((sppp + 1.0) * (1 << (nb - 1))), 0, amax
        ).astype(np.int64)
        for s in range(12):
            for sb in range(32):
                for c in range(channels):
                    w.write(int(raw[c, s, sb]), nb)
        out += w.pad_to(frame_bytes)
    return bytes(out)


def layer1_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """MPEG-1 Layer I stream → (sample_rate, channels, float PCM
    (n, channels)).  Walks every frame (ID3v2 skipped, CRC16 words
    skipped), dequantizes with the ISO Layer I formula
    ``s'' = (2^nb/(2^nb-1)) · (raw/2^(nb-1) - 1 + 2^(1-nb))``, and runs
    ONE synthesis pass over the whole subband sequence so filter state
    is continuous across frame boundaries.  The leading chain delay is
    trimmed, matching ``layer1_encode``'s padding.

    Layer II/III frames raise ``NotImplementedError`` by design (see
    module docblock)."""
    pos = _id3v2_size(data)
    rate = channels = None
    allS: list[np.ndarray] = []  # per frame: (ch, 12, 32)
    while pos + 4 <= len(data):
        hdr = _mpa_frame(data, pos)
        if hdr is None:
            pos += 1  # resync, same policy as the frame walk
            continue
        fbytes, _samples, frate, _br, layer, _ver, fch = hdr
        if layer != 1:
            raise NotImplementedError(
                f"Layer {layer} sample decode unsupported (frame geometry "
                "via mp3_frame_profile; see mpegaudio docblock)"
            )
        if pos + fbytes > len(data):
            break  # partial trailing frame
        if rate is None:
            rate, channels = frate, fch
        mode = (data[pos + 3] >> 6) & 0x03
        bound = 32
        if mode == 0b01:  # joint (intensity) stereo
            bound = (((data[pos + 3] >> 4) & 0x03) + 1) * 4
        r = _BitReader(data, pos + 4)
        if not (data[pos + 1] & 0x01):  # protection bit 0 → CRC16 present
            r.read(16)
        nch = fch
        alloc = np.zeros((nch, 32), dtype=np.int64)
        for sb in range(32):
            for c in range(nch if sb < bound else 1):
                a = r.read(4)
                if a == 15:
                    raise ValueError("forbidden Layer I allocation 15")
                for cc in range(nch) if sb >= bound else [c]:
                    alloc[cc, sb] = a
        sf = np.zeros((nch, 32), dtype=np.int64)
        for sb in range(32):
            for c in range(nch):
                if alloc[c, sb]:
                    sf[c, sb] = r.read(6)
        S = np.zeros((nch, 12, 32))
        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for c in range(nch):
                        a = alloc[c, sb]
                        if not a:
                            continue
                        nb = a + 1
                        raw = r.read(nb)
                        frac = raw / (1 << (nb - 1)) - 1.0
                        S[c, s, sb] = (
                            ((1 << nb) / ((1 << nb) - 1))
                            * (frac + 2.0 ** (1 - nb))
                            * SCALEFACTORS[sf[c, sb]]
                        )
                else:  # intensity: one sample, per-channel scalefactors
                    a = alloc[0, sb]
                    if not a:
                        continue
                    nb = a + 1
                    raw = r.read(nb)
                    frac = raw / (1 << (nb - 1)) - 1.0
                    base = ((1 << nb) / ((1 << nb) - 1)) * (
                        frac + 2.0 ** (1 - nb)
                    )
                    for c in range(nch):
                        S[c, s, sb] = base * SCALEFACTORS[sf[c, sb]]
        allS.append(S)
        pos += fbytes
    if rate is None or not allS:
        raise ValueError("no Layer I frames found")
    sub = np.concatenate(allS, axis=1)  # (ch, nf, 32)
    pcm = np.stack(
        [synthesis_frames(sub[c]) for c in range(channels)], axis=1
    )
    return rate, channels, pcm[_DELAY:]


# ---------------------------------------------------------------------------
# Layer II frame codec (round-9)
# ---------------------------------------------------------------------------

_L2_BITRATES = {  # kbps → header index (MPEG1 Layer II)
    32: 1, 48: 2, 56: 3, 64: 4, 80: 5, 96: 6, 112: 7, 128: 8,
    160: 9, 192: 10, 224: 11, 256: 12, 320: 13, 384: 14,
}

#: ISO 11172-3 Annex B.2 quantization-class rows.  Each row is
#: (allocation_field_bits, levels_per_class) — class 0 is always "no
#: samples".  The 3/5/9-level classes GROUP three samples into one
#: 5/7/10-bit codeword; every other class is 2^k-1 levels at k bits.
_L2_ROW_A = (4, (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                 8191, 16383, 32767, 65535))
_L2_ROW_B = (4, (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
                 4095, 8191, 65535))
_L2_ROW_C = (3, (0, 3, 5, 7, 9, 15, 31, 65535))
_L2_ROW_D = (2, (0, 3, 5, 65535))
#: B.2c/B.2d low-rate row: one uniform 4-bit class ladder for EVERY
#: subband — the grouped 3/5/9 classes then straight 2^k−1 steps up to
#: 32767 (no 65535 terminal: index 15 is the 16th entry 32767).  The two
#: tables differ only in sblimit (8 vs 12).
_L2_ROW_E = (4, (0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
                 4095, 8191, 16383, 32767))


def _l2_table(rate: int, kbps_per_ch: int):
    """(sblimit, per-subband row list) — ISO 11172-3 2.4.2.3 selection.
    B.2a (sblimit 27) for 48 kHz and for 44.1/32 kHz up to 80 kbps/ch;
    B.2b (sblimit 30) for 44.1/32 kHz above that; the low-rate tables
    (<=48 kbps/ch, r10) B.2c (sblimit 8, 48/44.1 kHz) and B.2d (sblimit
    12, 32 kHz) — a single uniform 4-bit ladder per subband, pinned by
    encode→decode round-trip + spectral parity like B.2a/B.2b."""
    if kbps_per_ch <= 48:
        sblimit = 12 if rate == 32000 else 8
        return sblimit, [_L2_ROW_E] * sblimit
    if rate == 48000 or kbps_per_ch <= 80:
        sblimit = 27
    else:
        sblimit = 30
    rows = (
        [_L2_ROW_A] * 3 + [_L2_ROW_B] * 8 + [_L2_ROW_C] * 12
        + [_L2_ROW_D] * (sblimit - 23)
    )
    return sblimit, rows


def _l2_codeword(levels: int) -> tuple[bool, int]:
    """(grouped, bits of one codeword).  Grouped classes pack a triplet."""
    if levels == 3:
        return True, 5
    if levels == 5:
        return True, 7
    if levels == 9:
        return True, 10
    return False, levels.bit_length()


def layer2_encode(
    pcm: np.ndarray,
    rate: int,
    channels: int = 1,
    bitrate_kbps: int = 384,
) -> bytes:
    """Float PCM in [-1, 1] → MPEG-1 Layer II stream (ISO 11172-3).

    Frame = 1152 samples = 12 granules x 3 subband vectors.  Allocation
    is uniform-by-cost: the largest quantization class per subband whose
    triplet cost fits a global cap, the cap lowered until the frame
    budget holds (deterministic, no psychoacoustic model — this is the
    fixture/transport encoder, exactly Layer I's stance).  scfsi is
    always 0 (three scalefactors per subband) — valid and table-free.
    Verification: decode round-trip + spectral parity (the Layer I
    scheme); bit-exactness vs a reference encoder is NOT claimed (none
    exists in this environment — the honest bound documented in the
    module docblock)."""
    if rate not in _L1_RATES:
        raise ValueError(f"Layer II encoder supports rates {sorted(_L1_RATES)}")
    if bitrate_kbps not in _L2_BITRATES:
        raise ValueError(f"bitrate {bitrate_kbps} not a Layer II rate")
    sblimit, rows = _l2_table(rate, bitrate_kbps // channels)
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.shape[1] != channels:
        raise ValueError("channel count mismatch")
    pcm = np.concatenate([pcm, np.zeros((_DELAY, channels))])
    n_pad = (-pcm.shape[0]) % 1152
    pcm = np.concatenate([pcm, np.zeros((n_pad, channels))])
    sub = np.stack([analysis_frames(pcm[:, c]) for c in range(channels)])
    nframes = sub.shape[1] // 36

    slots = 144 * bitrate_kbps * 1000 // rate
    if slots * rate != 144 * bitrate_kbps * 1000:
        raise ValueError("rate/bitrate pair needs padding (unsupported)")
    frame_bits = slots * 8

    # uniform-by-cost allocation under the frame budget
    alloc_bits = channels * sum(r[0] for r in rows)
    chosen: list[int] | None = None
    for cap in range(48, 4, -1):  # triplet-cost ceiling in bits
        idxs, sample_bits = [], 0
        for bw, levels in rows:
            best, cost = 0, 0
            for i in range(len(levels) - 1, 0, -1):
                g, cb = _l2_codeword(levels[i])
                c3 = cb if g else 3 * cb
                if c3 <= cap:
                    best, cost = i, c3
                    break
            idxs.append(best)
            sample_bits += 12 * cost * channels
        used = sum(1 for i in idxs if i) * channels
        total = 32 + alloc_bits + 2 * used + 18 * used + sample_bits
        if total <= frame_bits and all(idxs):
            chosen = idxs
            break
    if chosen is None:
        raise ValueError(
            "bitrate too low for all-subband Layer II allocation "
            "(raise bitrate_kbps)"
        )

    header = (
        (0xFFF << 20) | (0b11 << 19) | (0b10 << 17) | (1 << 16)
        | (_L2_BITRATES[bitrate_kbps] << 12) | (_L1_RATES[rate] << 10)
        | ((0b11 if channels == 1 else 0b00) << 6)
    )
    out = bytearray()
    for f in range(nframes):
        S = sub[:, f * 36:(f + 1) * 36, :]  # (ch, 36, 32)
        w = _BitWriter()
        w.write(header, 32)
        for sb in range(sblimit):
            for _c in range(channels):
                w.write(chosen[sb], rows[sb][0])
        for sb in range(sblimit):
            for _c in range(channels):
                w.write(0, 2)  # scfsi 0: three scalefactors
        # per-part scalefactors: part p covers samples 12p..12p+11
        sf_idx = np.zeros((channels, sblimit, 3), dtype=np.int64)
        for c in range(channels):
            for sb in range(sblimit):
                for p in range(3):
                    peak = np.abs(S[c, 12 * p:12 * (p + 1), sb]).max()
                    covered = np.nonzero(SCALEFACTORS >= peak + 1e-12)[0]
                    sf_idx[c, sb, p] = covered[-1] if len(covered) else 0
        for sb in range(sblimit):
            for c in range(channels):
                for p in range(3):
                    w.write(int(sf_idx[c, sb, p]), 6)
        for gr in range(12):
            p = gr // 4
            for sb in range(sblimit):
                levels = rows[sb][1][chosen[sb]]
                grouped, cb = _l2_codeword(levels)
                for c in range(channels):
                    sf = SCALEFACTORS[sf_idx[c, sb, p]]
                    codes = []
                    for i in range(3):
                        frac = S[c, gr * 3 + i, sb] / sf
                        q = int((frac + 1.0) * levels / 2.0)
                        codes.append(min(max(q, 0), levels - 1))
                    if grouped:
                        w.write(
                            codes[0] + levels * codes[1]
                            + levels * levels * codes[2],
                            cb,
                        )
                    else:
                        for q in codes:
                            w.write(q, cb)
        out += w.pad_to(slots)
    return bytes(out)


def layer2_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """MPEG-1 Layer II stream → (sample_rate, channels, float PCM).
    Requantization is the closed form ``s = (2c + 1 - n) / n`` — exactly
    the spec's C/D two-step collapsed (for n = 2^k - 1 it equals Layer
    I's ``2^k/(2^k-1) · (s''' + 2^(1-k))``; for the grouped 3/5/9-level
    classes it reproduces the B.4 constants 4/3, 8/5, 16/9 with D=1/2).
    Joint (intensity) stereo applies shared samples with per-channel
    scalefactors below the bound, like the Layer I path."""
    pos = _id3v2_size(data)
    rate = channels = None
    allS: list[np.ndarray] = []
    while pos + 4 <= len(data):
        hdr = _mpa_frame(data, pos)
        if hdr is None:
            pos += 1
            continue
        fbytes, _samples, frate, fbr, layer, _ver, fch = hdr
        if layer != 2:
            raise NotImplementedError(
                f"Layer {layer} in a Layer II decode call"
            )
        if pos + fbytes > len(data):
            break
        if rate is None:
            rate, channels = frate, fch
        # fbr is bits/s; the table select wants kbps PER CHANNEL (latent
        # until r10: every pre-B.2c rate landed in the same branch
        # either way — the low-rate threshold exposed the unit mismatch)
        sblimit, rows = _l2_table(frate, fbr // 1000 // fch)
        mode = (data[pos + 3] >> 6) & 0x03
        bound = sblimit
        if mode == 0b01:
            bound = min(sblimit, (((data[pos + 3] >> 4) & 0x03) + 1) * 4)
        r = _BitReader(data, pos + 4)
        if not (data[pos + 1] & 0x01):
            r.read(16)  # CRC16
        nch = fch
        alloc = np.zeros((nch, sblimit), dtype=np.int64)
        for sb in range(sblimit):
            if sb < bound:
                for c in range(nch):
                    alloc[c, sb] = r.read(rows[sb][0])
            else:
                a = r.read(rows[sb][0])
                alloc[:, sb] = a
        scfsi = np.zeros((nch, sblimit), dtype=np.int64)
        for sb in range(sblimit):
            for c in range(nch):
                if alloc[c, sb]:
                    scfsi[c, sb] = r.read(2)
        sf = np.zeros((nch, sblimit, 3), dtype=np.int64)
        for sb in range(sblimit):
            for c in range(nch):
                if not alloc[c, sb]:
                    continue
                mode_bits = scfsi[c, sb]
                if mode_bits == 0:
                    sf[c, sb] = [r.read(6) for _ in range(3)]
                elif mode_bits == 1:
                    a, b = r.read(6), r.read(6)
                    sf[c, sb] = [a, a, b]
                elif mode_bits == 2:
                    a = r.read(6)
                    sf[c, sb] = [a, a, a]
                else:
                    a, b = r.read(6), r.read(6)
                    sf[c, sb] = [a, b, b]
        S = np.zeros((nch, 36, 32))
        for gr in range(12):
            p = gr // 4
            for sb in range(sblimit):
                if sb < bound:
                    for c in range(nch):
                        a = alloc[c, sb]
                        if not a:
                            continue
                        levels = rows[sb][1][a]
                        grouped, cb = _l2_codeword(levels)
                        if grouped:
                            g = r.read(cb)
                            codes = [g % levels, (g // levels) % levels,
                                     g // (levels * levels)]
                        else:
                            codes = [r.read(cb) for _ in range(3)]
                        scale = SCALEFACTORS[sf[c, sb, p]]
                        for i, q in enumerate(codes):
                            S[c, gr * 3 + i, sb] = (
                                (2 * q + 1 - levels) / levels * scale
                            )
                else:  # intensity: shared samples, per-channel scalefactors
                    a = alloc[0, sb]
                    if not a:
                        continue
                    levels = rows[sb][1][a]
                    grouped, cb = _l2_codeword(levels)
                    if grouped:
                        g = r.read(cb)
                        codes = [g % levels, (g // levels) % levels,
                                 g // (levels * levels)]
                    else:
                        codes = [r.read(cb) for _ in range(3)]
                    for i, q in enumerate(codes):
                        base = (2 * q + 1 - levels) / levels
                        for c in range(nch):
                            S[c, gr * 3 + i, sb] = (
                                base * SCALEFACTORS[sf[c, sb, p]]
                            )
        allS.append(S)
        pos += fbytes
    if rate is None or not allS:
        raise ValueError("no Layer II frames found")
    sub = np.concatenate(allS, axis=1)
    pcm = np.stack(
        [synthesis_frames(sub[c]) for c in range(channels)], axis=1
    )
    return rate, channels, pcm[_DELAY:]


def mpeg_audio_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Layer-dispatching MPEG audio sample decode: Layers I, II and III
    decode end-to-end (Layer III since r11: Huffman spectrum with the
    structurally verified Table B.7 transcriptions, requantization,
    hybrid IMDCT and polyphase synthesis — streams selecting one of the
    declared-unverified code tables 11/13/15/16/24 raise, naming it)."""
    pos = _id3v2_size(data)
    while pos + 4 <= len(data):
        hdr = _mpa_frame(data, pos)
        if hdr is not None:
            layer = hdr[4]
            if layer == 1:
                return layer1_decode(data)
            if layer == 2:
                return layer2_decode(data)
            return layer3_decode(data)
        pos += 1
    raise ValueError("no MPEG audio frames found")


# ---------------------------------------------------------------------------
# Layer III side information, bit reservoir and scalefactors (r10);
# spectrum + synthesis follow below (r11 — see the module docblock's
# Layer III scope note for the verification story).
#
# Everything here is fixed-width fields whose layout the spec states
# structurally: frame walk (multimodal.mp3_frame_profile), side
# information for MPEG-1 and MPEG-2 LSF layouts, the bit-reservoir chain
# (main_data_begin back-pointers resolved against actual frame payloads,
# with the no-overlap and capacity invariants checked), and scalefactor
# decode from the reservoir (MPEG-1 scfsi sharing; LSF scalefac_compress
# partitioning incl. the intensity variants, wired from mode_extension).
# ---------------------------------------------------------------------------

#: ISO 11172-3 slen1/slen2 by scalefac_compress (MPEG-1)
_L3_SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
)

#: ISO 13818-3 LSF scalefactor band partitioning: [blocknumber][bt][4]
#: where bt = 0 long, 1 short, 2 mixed; blocknumbers 3-5 are the
#: intensity-stereo variants.
_L3_LSF_NSFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
    ((7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)),
    ((6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)),
    ((8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)),
)


def _l3_lsf_slen(sfc: int, intensity: bool) -> tuple[tuple[int, ...], int, int]:
    """LSF scalefactor select (ISO 13818-3 2.4.3.2): scalefac_compress →
    (slen[4], blocknumber, preflag)."""
    pre = 0
    if intensity:
        sfc >>= 1
        if sfc < 180:
            slen = (sfc // 36, (sfc % 36) // 6, sfc % 6, 0)
            bn = 3
        elif sfc < 244:
            s = sfc - 180
            slen = ((s & 63) >> 4, (s & 15) >> 2, s & 3, 0)
            bn = 4
        else:
            s = sfc - 244
            slen = (s // 3, s % 3, 0, 0)
            bn = 5
    elif sfc < 400:
        slen = ((sfc >> 4) // 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3)
        bn = 0
    elif sfc < 500:
        s = sfc - 400
        slen = ((s >> 2) // 5, (s >> 2) % 5, s & 3, 0)
        bn = 1
    else:
        s = sfc - 500
        slen = (s // 3, s % 3, 0, 0)
        bn = 2
        pre = 1
    return slen, bn, pre


def _l3_read_granule(r: "_BitReader", lsf: bool) -> dict:
    """One granule-channel's side information fields."""
    g: dict = {}
    g["part2_3_length"] = r.read(12)
    g["big_values"] = r.read(9)
    g["global_gain"] = r.read(8)
    g["scalefac_compress"] = r.read(9 if lsf else 4)
    g["window_switching"] = r.read(1)
    if g["window_switching"]:
        g["block_type"] = r.read(2)
        g["mixed_block"] = r.read(1)
        g["table_select"] = [r.read(5) for _ in range(2)]
        g["subblock_gain"] = [r.read(3) for _ in range(3)]
        # spec: block_type 0 is forbidden when window_switching is set
    else:
        g["block_type"] = 0
        g["mixed_block"] = 0
        g["table_select"] = [r.read(5) for _ in range(3)]
        g["region0_count"] = r.read(4)
        g["region1_count"] = r.read(3)
    if not lsf:
        g["preflag"] = r.read(1)
    g["scalefac_scale"] = r.read(1)
    g["count1table_select"] = r.read(1)
    return g


def layer3_side_info(data: bytes) -> dict:
    """Parse EVERY Layer III frame's side information and resolve the
    BIT RESERVOIR chain (main_data_begin back-pointers), validating the
    two invariants the format guarantees:

    - a frame's back-pointer never reaches past the main data its
      predecessors actually provided (nor past the pointer's own field
      range — the reservoir is capacity-limited by construction);
    - granule payloads never overlap: each frame's main-data start is at
      or past the previous frame's start plus its declared
      ``part2_3_length`` bits (the gap is ancillary data).

    Returns ``{"version", "channels", "frames": [...], "reservoir":
    bytes, "starts": [bit offsets into reservoir]}`` — everything
    :func:`layer3_scalefactors` needs to decode scalefactors from the
    actual reservoir bytes.  Raises ``ValueError`` on any violated
    invariant (a corrupt or mis-parsed stream, never silently)."""
    pos = _id3v2_size(data)
    frames: list[dict] = []
    reservoir = bytearray()
    starts: list[int] = []
    version = channels = None
    consumed_end = 0  # bit offset one past the previous frame's payload
    while pos + 4 <= len(data):
        hdr = _mpa_frame(data, pos)
        if hdr is None:
            pos += 1
            continue
        fbytes, _samples, _rate, _br, layer, ver, nch = hdr
        if layer != 3:
            raise NotImplementedError("not a Layer III stream")
        if pos + fbytes > len(data):
            break
        if version is None:
            version, channels = ver, nch
        lsf = ver != 3
        # header byte 3: mode (bits 6-7), mode_extension (bits 4-5).
        # Joint stereo with the intensity bit set changes how channel 1's
        # LSF scalefac_compress partitions (ISO 13818-3 intensity rules).
        mode = data[pos + 3] >> 6
        mode_ext = (data[pos + 3] >> 4) & 0x3
        intensity = mode == 0b01 and bool(mode_ext & 0x1)
        r = _BitReader(data, pos + 4)
        crc_bytes = 0 if (data[pos + 1] & 0x01) else 2
        if crc_bytes:
            r.read(16)
        mdb = r.read(8 if lsf else 9)
        r.read({True: {1: 1, 2: 2}, False: {1: 5, 2: 3}}[lsf][nch])
        scfsi = (
            [[r.read(1) for _ in range(4)] for _ in range(nch)]
            if not lsf
            else []
        )
        n_gr = 1 if lsf else 2
        granules = [
            [_l3_read_granule(r, lsf) for _ in range(nch)]
            for _ in range(n_gr)
        ]
        side_bytes = {True: {1: 9, 2: 17}, False: {1: 17, 2: 32}}[lsf][nch]
        assert r.bytepos - (pos + 4) - crc_bytes == side_bytes
        # reservoir bookkeeping: this frame CONTRIBUTES its main-data
        # region; its own payload STARTS mdb bytes before the bytes
        # written so far
        if mdb > len(reservoir):
            raise ValueError(
                f"frame {len(frames)}: main_data_begin {mdb} reaches "
                f"past the {len(reservoir)} reservoir bytes provided"
            )
        start_bit = (len(reservoir) - mdb) * 8
        if start_bit < consumed_end:
            raise ValueError(
                f"frame {len(frames)}: main data at bit {start_bit} "
                f"overlaps the previous frame's payload (ends "
                f"{consumed_end})"
            )
        p23 = sum(g["part2_3_length"] for gr in granules for g in gr)
        consumed_end = start_bit + p23
        main = data[pos + 4 + crc_bytes + side_bytes : pos + fbytes]
        reservoir.extend(main)
        if consumed_end > len(reservoir) * 8:
            raise ValueError(
                f"frame {len(frames)}: declared part2_3 bits run past "
                "the main data provided so far"
            )
        starts.append(start_bit)
        frames.append(
            {
                "pos": pos,
                "main_data_begin": mdb,
                "scfsi": scfsi,
                "granules": granules,
                "main_bytes": len(main),
                "intensity_stereo": intensity,
                "ms_stereo": mode == 0b01 and bool(mode_ext & 0x2),
            }
        )
        pos += fbytes
    if version is None:
        raise ValueError("no Layer III frames found")
    return {
        "version": version,
        "channels": channels,
        "frames": frames,
        "reservoir": bytes(reservoir),
        "starts": starts,
    }


def layer3_scalefactors(data: bytes) -> list[dict]:
    """Decode every granule's SCALEFACTORS from the resolved bit
    reservoir — the part-2 payload that precedes the Huffman spectrum.
    MPEG-1: slen1/slen2 with scfsi band-group sharing from granule 0;
    short/mixed window layouts.  LSF: the scalefac_compress partition
    rules (:func:`_l3_lsf_slen`).  Each record carries ``part2_bits``
    and asserts it never exceeds the granule's declared
    ``part2_3_length`` — the strongest spectral-layer check available
    without the Huffman code tables."""
    si = layer3_side_info(data)
    lsf = si["version"] != 3
    res = si["reservoir"]
    out: list[dict] = []
    for fi, (frame, start) in enumerate(zip(si["frames"], si["starts"])):
        r = _BitReader(res, start // 8)
        r.bitpos = start % 8
        gr0_sf: list[dict] = []
        for gi, chans in enumerate(frame["granules"]):
            for ci, g in enumerate(chans):
                bits0 = r.bytepos * 8 + r.bitpos
                short = g["block_type"] == 2 and not g["mixed_block"]
                mixed = g["block_type"] == 2 and g["mixed_block"]
                sf_l: list[int] = []
                sf_s: list[list[int]] = [[], [], []]
                if lsf:
                    # ISO 13818-3: under intensity stereo the RIGHT
                    # channel's scalefac_compress is partitioned by the
                    # intensity rules (blocknumbers 3-5; LSB is
                    # intensity_scale) — ADVICE r11 wired this through
                    # from the header's mode_extension
                    slen, bn, _pre = _l3_lsf_slen(
                        g["scalefac_compress"],
                        intensity=frame["intensity_stereo"] and ci == 1,
                    )
                    bt = 1 if short else (2 if mixed else 0)
                    nsfb = _L3_LSF_NSFB[bn][bt]
                    for part, n in enumerate(nsfb):
                        for _ in range(n):
                            v = r.read(slen[part])
                            if bt == 1:
                                sf_s[len(sf_l) % 3].append(v)
                                sf_l.append(v)  # positional record
                            else:
                                sf_l.append(v)
                else:
                    slen1, slen2 = _L3_SLEN[g["scalefac_compress"]]
                    if short:
                        for band in range(12):
                            for w in range(3):
                                sf_s[w].append(
                                    r.read(slen1 if band < 6 else slen2)
                                )
                    elif mixed:
                        sf_l = [r.read(slen1) for _ in range(8)]
                        for band in range(3, 12):
                            for w in range(3):
                                sf_s[w].append(
                                    r.read(slen1 if band < 6 else slen2)
                                )
                    else:
                        share = (
                            frame["scfsi"][ci] if gi == 1 else [0, 0, 0, 0]
                        )
                        groups = ((0, 6, slen1), (6, 11, slen1),
                                  (11, 16, slen2), (16, 21, slen2))
                        prev = (
                            gr0_sf[ci]["scalefac_l"] if gi == 1 else None
                        )
                        for gidx, (lo, hi, sl) in enumerate(groups):
                            if share[gidx]:
                                sf_l.extend(prev[lo:hi])
                            else:
                                sf_l.extend(
                                    r.read(sl) for _ in range(hi - lo)
                                )
                part2 = r.bytepos * 8 + r.bitpos - bits0
                if part2 > g["part2_3_length"]:
                    raise ValueError(
                        f"frame {fi} granule {gi} ch {ci}: scalefactor "
                        f"bits {part2} exceed part2_3_length "
                        f"{g['part2_3_length']}"
                    )
                rec = {
                    "frame": fi,
                    "granule": gi,
                    "channel": ci,
                    "scalefac_l": sf_l,
                    "scalefac_s": sf_s,
                    "part2_bits": part2,
                    "huffman_bits": g["part2_3_length"] - part2,
                }
                if gi == 0:
                    gr0_sf.append(rec)
                out.append(rec)
                # skip this granule's Huffman spectrum to land on the
                # next granule's scalefactors
                skip = g["part2_3_length"] - part2
                while skip > 0:
                    n = min(skip, 32)
                    r.read(n)
                    skip -= n
    return out


# ---------------------------------------------------------------------------
# Layer III spectrum decode (r11) — Huffman tables, requantization,
# reorder, alias reduction, IMDCT, and full PCM synthesis.
#
# The Huffman code tables are ISO 11172-3 Table B.7 constants.  Each
# shipped table is transcription-VERIFIED structurally: its (hlen, hcod)
# pairs must tile the binary code tree EXACTLY (distinct, prefix-free,
# Kraft sum == 1) — a joint constraint across all entries that a
# mis-transcribed table essentially cannot satisfy (tests pin it).
# Tables whose transcription could not be verified offline are DECLARED,
# per id, and decode raises naming them: big-value code tables 11, 13,
# 15, 16 (ids 16-23) and 24 (ids 24-31).  Everything else — both count1
# tables, requantization, short-block reorder, alias butterflies, the
# 36/12-point IMDCT windows, and the polyphase synthesis — is
# closed-form per the spec and pinned by spectral-parity round-trips
# through layer3_encode (same honesty bound as Layers I/II: bit-exact
# parity vs a third-party decoder is not claimable in this container).
# ---------------------------------------------------------------------------

#: verified big-value code tables: id -> (hlen tuple, hcod tuple), x-major
_L3_HUFF: dict[int, tuple[tuple[int, ...], tuple[int, ...]]] = {
    1: ((1, 3, 2, 3), (1, 1, 1, 0)),
    2: ((1, 3, 6, 3, 3, 5, 5, 5, 6), (1, 2, 1, 3, 1, 1, 3, 2, 0)),
    3: ((2, 2, 6, 3, 2, 5, 5, 5, 6), (3, 2, 1, 1, 1, 1, 3, 2, 0)),
    5: (
        (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
        (1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0),
    ),
    6: (
        (3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
        (7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0),
    ),
    7: (
        (1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8, 8, 9,
         7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10),
        (1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17, 8, 4,
         12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4, 5, 3, 2, 0),
    ),
    8: (
        (2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8, 8, 9,
         8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11),
        (3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14, 7, 3,
         19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4, 4, 1, 1, 0),
    ),
    9: (
        (3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6, 7, 8,
         6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9),
        (7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8, 8, 5,
         15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4, 6, 2, 6, 0),
    ),
    10: (
        (1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
         6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
         8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
         8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11),
        (1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
         11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
         20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
         14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0),
    ),
    12: (
        (4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
         5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
         7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
         8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10),
        (9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
         17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
         32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
         27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0),
    ),
}

#: count1 quadruple tables (ISO Table B.7 A/B); index = v*8+w*4+x*2+y
_L3_COUNT1 = {
    0: (
        (1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6),
        (1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1),
    ),
    1: ((4,) * 16, tuple(range(15, -1, -1))),
}

#: table id -> (codes_id, xy_size, linbits); codes_id keys _L3_HUFF
_L3_TABLES: dict[int, tuple[int, int, int]] = {
    0: (0, 0, 0),
    **{i: (i, {1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6,
               10: 8, 11: 8, 12: 8, 13: 16, 15: 16}[i], 0)
       for i in (1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15)},
    **{16 + i: (16, 16, lb)
       for i, lb in enumerate((1, 2, 3, 4, 6, 8, 10, 13))},
    **{24 + i: (24, 16, lb)
       for i, lb in enumerate((4, 5, 6, 7, 8, 9, 11, 13))},
}

#: ISO 11172-3 2.4.3.4.6 preemphasis table (21 long scalefactor bands)
_L3_PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
              1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

#: scalefactor band WIDTHS (Table B.8): rate -> long (22 bands tiling
#: 576) / short (13 bands tiling 192 per window).  Structural checksums
#: (the tilings) are test-pinned.
_L3_SFB_LONG = {
    44100: (4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28,
            34, 42, 50, 54, 76, 158),
    48000: (4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28,
            34, 40, 46, 54, 54, 192),
    32000: (4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30, 38,
            46, 56, 68, 84, 102, 26),
    22050: (6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
            46, 52, 60, 68, 58, 54),
    24000: (6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 18, 22, 26, 32, 38,
            46, 54, 62, 70, 76, 36),
    16000: (6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 38,
            46, 52, 60, 68, 58, 54),
}
_L3_SFB_SHORT = {
    44100: (4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56),
    48000: (4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66),
    32000: (4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12),
    22050: (4, 4, 4, 6, 6, 8, 10, 14, 18, 26, 32, 42, 18),
    24000: (4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 32, 44, 12),
    16000: (4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18),
}

#: alias-reduction coefficients (ISO 11172-3 2.4.3.4.10.1, Table B.9)
_L3_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
_L3_CS = tuple(1.0 / (1.0 + c * c) ** 0.5 for c in _L3_CI)
_L3_CA = tuple(c / (1.0 + c * c) ** 0.5 for c in _L3_CI)


@lru_cache(maxsize=None)
def _l3_tree(codes_id: int, count1: bool = False) -> dict:
    """(nbits, code) -> symbol index decode map for one code table."""
    lens, codes = (_L3_COUNT1 if count1 else _L3_HUFF)[codes_id]
    return {(l, c): i for i, (l, c) in enumerate(zip(lens, codes))}


def _l3_read_symbol(r: "_BitReader", tree: dict) -> int:
    acc = n = 0
    while True:
        acc = (acc << 1) | r.read(1)
        n += 1
        sym = tree.get((n, acc))
        if sym is not None:
            return sym
        if n > 19:
            raise ValueError("Huffman desync: no code within 19 bits")


@lru_cache(maxsize=None)
def _l3_bounds_long(rate: int) -> tuple[int, ...]:
    b, out = 0, [0]
    for w in _L3_SFB_LONG[rate]:
        b += w
        out.append(b)
    return tuple(out)


@lru_cache(maxsize=None)
def _l3_bounds_short(rate: int) -> tuple[int, ...]:
    b, out = 0, [0]
    for w in _L3_SFB_SHORT[rate]:
        b += w
        out.append(b)
    return tuple(out)


def _l3_bitpos(r: "_BitReader") -> int:
    return r.bytepos * 8 + r.bitpos


def _l3_huffman_spectrum(
    r: "_BitReader", g: dict, rate: int, limit_bit: int
) -> np.ndarray:
    """Decode one granule-channel's Huffman region into ix[576] (signed
    ints; linbits escapes applied).  ``limit_bit`` is the granule's
    absolute part2_3 end — count1 decoding stops there, and a quadruple
    that OVERRUNS the boundary is discarded (the spec's stuffing rule).
    Raises, naming the table id, when a region selects one of the
    declared-unverified code tables."""
    ix = np.zeros(576, dtype=np.int64)
    bv_end = 2 * g["big_values"]
    if bv_end > 576:
        raise ValueError(f"big_values {g['big_values']} > 288")
    short = g["block_type"] == 2 and g["window_switching"]
    if short:
        # short + mixed: region0 fixed at 36 lines, region1 to the end
        regions = [(0, min(36, bv_end)), (min(36, bv_end), bv_end)]
    elif g["window_switching"]:
        # long start/stop blocks (types 1/3): the side info carries only
        # TWO table_selects and no region counts — region0_count is
        # implicitly 7 (8 bands) and region1 runs to big_values' end
        bl = _l3_bounds_long(rate)
        r0_end = min(bl[8], bv_end)
        regions = [(0, r0_end), (r0_end, bv_end)]
    else:
        bl = _l3_bounds_long(rate)
        r0 = min(g["region0_count"] + 1, len(bl) - 1)
        r1 = min(r0 + g["region1_count"] + 1, len(bl) - 1)
        regions = [
            (0, min(bl[r0], bv_end)),
            (min(bl[r0], bv_end), min(bl[r1], bv_end)),
            (min(bl[r1], bv_end), bv_end),
        ]
    for ri, (lo, hi) in enumerate(regions):
        if hi <= lo:
            continue
        tid = g["table_select"][ri] if ri < len(g["table_select"]) else 0
        if tid == 0:
            continue  # table 0: all zeros, no bits
        if tid not in _L3_TABLES or tid in (4, 14):
            raise ValueError(f"reserved Huffman table id {tid}")
        codes_id, _xy, linbits = _L3_TABLES[tid]
        if codes_id not in _L3_HUFF:
            raise NotImplementedError(
                f"Huffman code table {codes_id} (selected as id {tid}) is "
                "declared-unverified offline: transcription could not be "
                "structurally confirmed (tables 11, 13, 15, 16, 24)"
            )
        tree = _l3_tree(codes_id)
        for pos in range(lo, hi, 2):
            sym = _l3_read_symbol(r, tree)
            x, y = divmod(sym, _L3_TABLES[tid][1])
            if x == 15 and linbits:
                x += r.read(linbits)
            if x:
                if r.read(1):
                    x = -x
            if y == 15 and linbits:
                y += r.read(linbits)
            if y:
                if r.read(1):
                    y = -y
            ix[pos], ix[pos + 1] = x, y
    # count1: quadruples of |v| <= 1 until the bit budget or line 576
    tree1 = _l3_tree(g["count1table_select"], count1=True)
    pos = bv_end
    while pos <= 572 and _l3_bitpos(r) < limit_bit:
        mark = (r.bytepos, r.bitpos)
        sym = _l3_read_symbol(r, tree1)
        quad = [(sym >> 3) & 1, (sym >> 2) & 1, (sym >> 1) & 1, sym & 1]
        for k in range(4):
            if quad[k]:
                quad[k] = -1 if r.read(1) else 1
        if _l3_bitpos(r) > limit_bit:
            # overran the granule boundary: the last quadruple is
            # stuffing, not data — discard it and rewind
            r.bytepos, r.bitpos = mark
            break
        ix[pos:pos + 4] = quad
        pos += 4
    return ix


def _l3_requantize(
    ix: np.ndarray, g: dict, rec: dict, rate: int, lsf: bool,
    intensity: bool,
) -> np.ndarray:
    """ix -> xr: sign(ix) * |ix|^(4/3) * 2^(gain exponents)
    (ISO 11172-3 2.4.3.4.7.1; LSF per 13818-3)."""
    xr = np.sign(ix) * np.abs(ix).astype(np.float64) ** (4.0 / 3.0)
    mult = 0.5 * (g["scalefac_scale"] + 1)
    if lsf:
        _slen, _bn, pre = _l3_lsf_slen(
            g["scalefac_compress"], intensity=intensity
        )
    else:
        pre = g.get("preflag", 0)
    gg = 0.25 * (g["global_gain"] - 210)
    short = g["block_type"] == 2 and g["window_switching"]
    mixed = short and g["mixed_block"]
    exp = np.zeros(576)
    if short and not mixed:
        bs = _l3_bounds_short(rate)
        sf_s = rec["scalefac_s"]
        for sfb in range(len(bs) - 1):
            w0 = bs[sfb] * 3
            width = bs[sfb + 1] - bs[sfb]
            for w in range(3):
                sf = sf_s[w][sfb] if sfb < len(sf_s[w]) else 0
                e = gg - 2.0 * g["subblock_gain"][w] - mult * sf
                lo = w0 + w * width
                exp[lo:lo + width] = e
    else:
        bl = _l3_bounds_long(rate)
        sf_l = rec["scalefac_l"]
        for sfb in range(len(bl) - 1):
            sf = sf_l[sfb] if sfb < len(sf_l) else 0
            e = gg - mult * (sf + pre * _L3_PRETAB[sfb])
            exp[bl[sfb]:bl[sfb + 1]] = e
        if mixed:
            # mixed blocks: lines >= 36 follow the short layout from the
            # third short band on (structural; encoder never emits them)
            bs = _l3_bounds_short(rate)
            sf_s = rec["scalefac_s"]
            for sfb in range(3, len(bs) - 1):
                w0 = bs[sfb] * 3
                width = bs[sfb + 1] - bs[sfb]
                for w in range(3):
                    sf = sf_s[w][sfb - 3] if sfb - 3 < len(sf_s[w]) else 0
                    e = gg - 2.0 * g["subblock_gain"][w] - mult * sf
                    lo = w0 + w * width
                    if lo >= 36:
                        exp[lo:lo + width] = e
    return xr * np.exp2(exp)


def _l3_reorder(xr: np.ndarray, g: dict, rate: int) -> np.ndarray:
    """Short-block reorder: decoded order is (sfb, window, line); the
    filterbank wants windows interleaved at line granularity within each
    band triplet (dst = 3*band_start + 3*i + w)."""
    if not (g["block_type"] == 2 and g["window_switching"]):
        return xr
    if g["mixed_block"]:
        return xr  # encoder never emits mixed; lines stay in place
    out = np.zeros_like(xr)
    bs = _l3_bounds_short(rate)
    src = 0
    for sfb in range(len(bs) - 1):
        width = bs[sfb + 1] - bs[sfb]
        base = 3 * bs[sfb]
        for w in range(3):
            for i in range(width):
                out[base + 3 * i + w] = xr[src]
                src += 1
    return out


def _l3_antialias(xr: np.ndarray, g: dict) -> np.ndarray:
    """Alias-reduction butterflies across each long-block subband
    boundary (ISO 2.4.3.4.10.1)."""
    if g["block_type"] == 2 and g["window_switching"] and not g["mixed_block"]:
        return xr
    out = xr.copy()
    n_sb = 32 if not (g["block_type"] == 2 and g["window_switching"]) else 2
    for sb in range(1, n_sb):
        for i in range(8):
            a = out[18 * sb - 1 - i]
            b = out[18 * sb + i]
            out[18 * sb - 1 - i] = a * _L3_CS[i] - b * _L3_CA[i]
            out[18 * sb + i] = b * _L3_CS[i] + a * _L3_CA[i]
    return out


@lru_cache(maxsize=None)
def _l3_imdct_mats() -> tuple[np.ndarray, np.ndarray, dict]:
    """36-point and 12-point IMDCT matrices + block-type windows
    (closed-form sine windows, ISO 2.4.3.4.10.3)."""
    n36 = np.arange(36)[:, None]
    k18 = np.arange(18)[None, :]
    M36 = np.cos(np.pi / 72.0 * (2 * n36 + 1 + 18) * (2 * k18 + 1))
    n12 = np.arange(12)[:, None]
    k6 = np.arange(6)[None, :]
    M12 = np.cos(np.pi / 24.0 * (2 * n12 + 1 + 6) * (2 * k6 + 1))
    n = np.arange(36)
    win = {}
    win[0] = np.sin(np.pi / 36.0 * (n + 0.5))
    w1 = np.sin(np.pi / 36.0 * (n + 0.5)).copy()
    w1[18:24] = 1.0
    w1[24:30] = np.sin(np.pi / 12.0 * (n[24:30] - 18 + 0.5))
    w1[30:] = 0.0
    win[1] = w1
    w3 = np.zeros(36)
    w3[6:12] = np.sin(np.pi / 12.0 * (n[6:12] - 6 + 0.5))
    w3[12:18] = 1.0
    w3[18:] = np.sin(np.pi / 36.0 * (n[18:] + 0.5))
    win[3] = w3
    win["short"] = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
    return M36, M12, win


def _l3_imdct_granule(
    xr: np.ndarray, g: dict, overlap: np.ndarray
) -> np.ndarray:
    """Hybrid filterbank synthesis half: per-subband IMDCT + window +
    overlap-add + frequency inversion.  Returns (18, 32) time-domain
    subband samples; mutates ``overlap`` (32, 18) in place."""
    M36, M12, win = _l3_imdct_mats()
    short = g["block_type"] == 2 and g["window_switching"]
    mixed = short and g["mixed_block"]
    out = np.zeros((18, 32))
    for sb in range(32):
        X = xr[18 * sb:18 * (sb + 1)]
        use_short = short and (not mixed or sb >= 2)
        if use_short:
            z = np.zeros(36)
            ws = win["short"]
            for w in range(3):
                # window w's six lines: 3k + w (the reorder's interleave)
                xw = M12 @ X[np.arange(6) * 3 + w]
                z[6 + 6 * w:18 + 6 * w] += xw * ws
        else:
            bt = g["block_type"] if not mixed or sb >= 2 else 0
            if bt == 2:
                bt = 0
            z = (M36 @ X) * win[bt]
        out[:, sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
        if sb % 2 == 1:
            # frequency inversion: odd time samples of odd subbands
            out[1::2, sb] = -out[1::2, sb]
    return out


def layer3_spectra(data: bytes) -> list[dict]:
    """Decode every granule-channel's REQUANTIZED spectrum xr[576] (plus
    the raw quantized ix[576]) from the bit reservoir — scalefactors via
    :func:`layer3_scalefactors`, Huffman region + count1 per the side
    info, then the 2^(gain) requantizer.  Each record extends the
    scalefactor record with ``ix``, ``xr`` and ``huffman_bits_read``.

    The strongest structural check runs per granule: Huffman decode must
    land EXACTLY on the granule's part2_3 boundary (count1 stuffing
    overrun discarded per spec); a desynced table would violate it on
    essentially every non-empty granule."""
    si = layer3_side_info(data)
    lsf = si["version"] != 3
    # sample rate from the first frame header
    hdr = _mpa_frame(data, si["frames"][0]["pos"])
    rate = hdr[2]
    if rate not in _L3_SFB_LONG:
        raise NotImplementedError(
            f"no scalefactor-band table for rate {rate} (MPEG-2.5)"
        )
    res = si["reservoir"]
    sf_recs = {
        (x["frame"], x["granule"], x["channel"]): x
        for x in layer3_scalefactors(data)
    }
    out = []
    for fi, (frame, start) in enumerate(zip(si["frames"], si["starts"])):
        bit = start
        for gi, chans in enumerate(frame["granules"]):
            for ci, g in enumerate(chans):
                rec = dict(sf_recs[(fi, gi, ci)])
                limit = bit + g["part2_3_length"]
                r = _BitReader(res, (bit + rec["part2_bits"]) // 8)
                r.bitpos = (bit + rec["part2_bits"]) % 8
                h0 = _l3_bitpos(r)
                ix = _l3_huffman_spectrum(r, g, rate, limit)
                used = _l3_bitpos(r) - h0
                if _l3_bitpos(r) > limit:
                    raise ValueError(
                        f"frame {fi} gr {gi} ch {ci}: Huffman decode ran "
                        f"{_l3_bitpos(r) - limit} bits past part2_3_length"
                    )
                intensity = bool(frame["intensity_stereo"]) and ci == 1
                xr = _l3_requantize(ix, g, rec, rate, lsf, intensity)
                rec.update(ix=ix, xr=xr, huffman_bits_read=used)
                out.append(rec)
                bit = limit
    return out


def layer3_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Full Layer III sample decode: spectra → (reorder, alias, hybrid
    IMDCT, frequency inversion) → polyphase synthesis → PCM (n, ch).

    Stereo modes: L/R and MS stereo decode; intensity-stereo SPECTRUM
    reconstruction is declared out (raises) — only its scalefactor
    partitioning is implemented (``layer3_scalefactors``)."""
    si = layer3_side_info(data)
    lsf = si["version"] != 3
    hdr = _mpa_frame(data, si["frames"][0]["pos"])
    rate, nch = hdr[2], si["channels"]
    if any(f["intensity_stereo"] for f in si["frames"]):
        raise NotImplementedError(
            "intensity-stereo spectrum reconstruction not implemented "
            "(scalefactor partitioning only)"
        )
    specs = layer3_spectra(data)
    by_key = {(x["frame"], x["granule"], x["channel"]): x for x in specs}
    n_gr = 1 if lsf else 2
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    blocks: list[np.ndarray] = []
    for fi, frame in enumerate(si["frames"]):
        for gi in range(n_gr):
            chans = frame["granules"][gi]
            xrs = [by_key[(fi, gi, ci)]["xr"] for ci in range(nch)]
            if nch == 2 and frame["ms_stereo"]:
                m, s = xrs
                inv = 1.0 / np.sqrt(2.0)
                xrs = [(m + s) * inv, (m - s) * inv]
            gran = np.zeros((18, 32, nch))
            for ci in range(nch):
                g = chans[ci]
                xr = _l3_reorder(xrs[ci], g, rate)
                xr = _l3_antialias(xr, g)
                gran[:, :, ci] = _l3_imdct_granule(xr, g, overlap[ci])
            blocks.append(gran)
    # ONE continuous polyphase synthesis per channel — per-granule calls
    # would reset the filter state every 576 samples
    S = np.concatenate(blocks, axis=0)  # (18 * n_granules, 32, nch)
    pcm = np.stack(
        [synthesis_frames(S[:, :, ci]) for ci in range(nch)], axis=1
    )
    # clamp like the int16 path; the near-PR bank can overshoot slightly
    return rate, nch, np.clip(pcm, -1.0, 1.0)


def _l3_best_table(max_abs: int) -> int:
    """Smallest VERIFIED big-value table covering ``max_abs``."""
    if max_abs == 0:
        return 0
    if max_abs <= 1:
        return 1
    if max_abs <= 2:
        return 2
    if max_abs <= 3:
        return 5
    if max_abs <= 5:
        return 7
    if max_abs <= 7:
        return 10
    raise ValueError(
        f"fixture encoder covers |ix| <= 7 (verified non-linbits tables); "
        f"got {max_abs}"
    )


def layer3_encode(
    granules_ix: list[np.ndarray],
    rate: int = 44100,
    *,
    global_gain: int = 210,
    version: int | None = None,
) -> bytes:
    """Fixture-grade Layer III ENCODER: one mono stream from quantized
    spectra (one ix[576] int array per granule, |values| <= 7, long
    blocks, all scalefactors 0, no bit reservoir).  MPEG-1 rates pack 2
    granules/frame; LSF rates 1.  Exists so the decoder is pinned by
    encode→decode SPECTRAL PARITY on non-trivial spectra — the Layer
    I/II fixture discipline (this is not a rate-distortion encoder)."""
    lsf = rate in (22050, 24000, 16000)
    n_gr = 1 if lsf else 2
    if len(granules_ix) % n_gr:
        granules_ix = list(granules_ix) + [np.zeros(576, dtype=np.int64)]
    # per-granule payload: huffman bits for big-value pairs + count1
    bl = _l3_bounds_long(rate)

    def encode_granule(ix: np.ndarray) -> tuple[dict, "_BitWriter", int]:
        ix = np.asarray(ix, dtype=np.int64)
        assert ix.shape == (576,)
        nz = np.nonzero(ix)[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        # trailing |v|<=1 region becomes count1 quads (4-aligned)
        c1_start = last
        while c1_start > 0 and abs(int(ix[c1_start - 1])) <= 1:
            c1_start -= 1
        bv_end = c1_start + (-c1_start % 2)  # pairs: even boundary
        if bv_end > 576:
            bv_end = 576
        # count1 region must be quad-aligned from bv_end
        n_quads = (last - bv_end + 3) // 4 if last > bv_end else 0
        # region split on sfb boundaries: region0 = first 8 bands,
        # region1 = next 8 (region0_count=7, region1_count=7)
        r0_end, r1_end = bl[8], bl[16]
        regions = [
            (0, min(r0_end, bv_end)),
            (min(r0_end, bv_end), min(r1_end, bv_end)),
            (min(r1_end, bv_end), bv_end),
        ]
        tsel = []
        w = _BitWriter()
        nbits = 0

        def put(v: int, n: int) -> None:
            nonlocal nbits
            w.write(v, n)
            nbits += n

        for lo, hi in regions:
            seg = ix[lo:hi]
            tid = _l3_best_table(int(np.abs(seg).max()) if hi > lo else 0)
            tsel.append(tid)
            if tid == 0:
                continue
            lens, codes = _L3_HUFF[tid]
            _cid, ylen, _lb = _L3_TABLES[tid]
            for p in range(lo, hi, 2):
                x, y = int(ix[p]), int(ix[p + 1])
                sym = abs(x) * ylen + abs(y)
                put(codes[sym], lens[sym])
                if x:
                    put(1 if x < 0 else 0, 1)
                if y:
                    put(1 if y < 0 else 0, 1)
        lens1, codes1 = _L3_COUNT1[0]
        for q in range(n_quads):
            vals = [
                int(ix[bv_end + 4 * q + k]) if bv_end + 4 * q + k < 576 else 0
                for k in range(4)
            ]
            sym = (abs(vals[0]) << 3) | (abs(vals[1]) << 2) | \
                  (abs(vals[2]) << 1) | abs(vals[3])
            put(codes1[sym], lens1[sym])
            for v in vals:
                if v:
                    put(1 if v < 0 else 0, 1)
        g = {
            "part2_3_length": nbits,  # scalefac bits = 0 (sfc 0, slens 0)
            "big_values": bv_end // 2,
            "global_gain": global_gain,
            "scalefac_compress": 0,
            "table_select": tsel,
            "region0_count": 7,
            "region1_count": 7,
        }
        return g, w, nbits

    # header: mono, no CRC, high bitrate so each frame holds its payload
    if lsf:
        ver_bits, br_idx = 0b10, 14  # MPEG2, 160 kbps
        bitrate = 160000
    else:
        ver_bits, br_idx = 0b11, 14  # MPEG1, 320 kbps
        bitrate = 320000
    sr_idx = {44100: 0, 48000: 1, 32000: 2, 22050: 0, 24000: 1, 16000: 2}[rate]
    coef = 72 if lsf else 144
    fbytes = coef * bitrate // rate
    side_bytes = 9 if lsf else 17  # mono
    hdr = bytes([
        0xFF,
        0xE0 | (ver_bits << 3) | (0b01 << 1) | 1,  # sync|ver|L3|no-CRC
        (br_idx << 4) | (sr_idx << 2),
        0xC0,  # mode: single channel
    ])
    out = bytearray()
    for f0 in range(0, len(granules_ix), n_gr):
        gs = []
        payload = _BitWriter()
        total_bits = 0
        for k in range(n_gr):
            g, w, nbits = encode_granule(granules_ix[f0 + k])
            gs.append(g)
            if w.nbits:
                w.write(0, 8 - w.nbits)  # byte-align the writer's tail
            # re-write at bit level to keep granules contiguous
            bits_left = nbits
            rr = _BitReader(bytes(w.buf))
            while bits_left > 0:
                n = min(24, bits_left)
                payload.write(rr.read(n), n)
                bits_left -= n
            total_bits += nbits
        main = payload.pad_to(fbytes - 4 - side_bytes)
        if total_bits > (fbytes - 4 - side_bytes) * 8:
            raise ValueError("granule payload exceeds frame size")
        s = _BitWriter()
        s.write(0, 8 if lsf else 9)   # main_data_begin: no reservoir
        s.write(0, 1 if lsf else 5)   # private bits (mono)
        if not lsf:
            s.write(0, 4)             # scfsi: all fresh
        for g in gs:
            s.write(g["part2_3_length"], 12)
            s.write(g["big_values"], 9)
            s.write(g["global_gain"], 8)
            s.write(0, 9 if lsf else 4)  # scalefac_compress = 0
            s.write(0, 1)             # window_switching: long blocks
            for tid in g["table_select"]:
                s.write(tid, 5)
            s.write(g["region0_count"], 4)
            s.write(g["region1_count"], 3)
            if not lsf:
                s.write(0, 1)         # preflag
            s.write(0, 1)             # scalefac_scale
            s.write(0, 1)             # count1table_select = A
        out += hdr + s.pad_to(side_bytes) + main
    return bytes(out)
