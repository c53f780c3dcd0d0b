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
  round-trip + spectral parity, the Layer I scheme; the low-rate
  B.2c/B.2d tables (<=48 kbps/ch) stay declared-unsupported, and
  bit-exactness vs a reference codec is NOT claimed (this container
  ships no twolame/ffmpeg to ground-truth against — same honesty bound
  as the filterbank note below).
- **Layer III sample decode stays declared-unsupported**
  (``NotImplementedError``): its Huffman tables are pages of tabulated
  constants; transcribing them from memory would produce silently wrong
  audio, which is worse than an explicit gap.  Frame geometry/duration
  remains fully handled by the frame walk.
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


def _l2_table(rate: int, kbps_per_ch: int):
    """(sblimit, per-subband row list) — ISO 11172-3 2.4.2.3 selection.
    B.2a (sblimit 27) for 48 kHz and for 44.1/32 kHz up to 80 kbps/ch;
    B.2b (sblimit 30) for 44.1/32 kHz above that.  The low-rate B.2c/d
    tables (<=48 kbps/ch) are declared-unsupported — this codec exists
    for fixture transcoding and pipeline decode of mainstream streams,
    and a wrong low-rate table would be silently nonconformant."""
    if kbps_per_ch <= 48:
        raise NotImplementedError(
            "Layer II <=48 kbps/ch uses the B.2c/B.2d tables "
            "(declared-unsupported; see module docblock)"
        )
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
        sblimit, rows = _l2_table(frate, fbr // fch)
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
    """Layer-dispatching MPEG-1 audio sample decode: Layer I and II
    decode end-to-end; Layer III raises (declared gap — its Huffman
    tables cannot be ground-truthed here; frame geometry still fully
    handled by ``multimodal.mp3_frame_profile``)."""
    pos = _id3v2_size(data)
    while pos + 4 <= len(data):
        hdr = _mpa_frame(data, pos)
        if hdr is not None:
            layer = hdr[4]
            if layer == 1:
                return layer1_decode(data)
            if layer == 2:
                return layer2_decode(data)
            raise NotImplementedError(
                "Layer III sample decode unsupported (frame geometry via "
                "mp3_frame_profile; see mpegaudio docblock)"
            )
        pos += 1
    raise ValueError("no MPEG audio frames found")
