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
- **Layer III** (r10): everything DERIVABLE is decoded for real — side
  information for both MPEG-1 and MPEG-2 LSF layouts (field widths are
  structural; the byte counts 9/17/17/32 are asserted against parsed
  positions), the BIT RESERVOIR chain (main_data_begin back-pointers
  resolved against actual frame payloads with no-overlap/capacity
  invariants), and SCALEFACTOR decode from the reservoir (MPEG-1 scfsi
  sharing, short/mixed layouts; the LSF scalefac_compress partition
  rules) — ground-truthed against the real Lavf-encoded system fixture
  plus synthetic reservoir streams read back bit-exactly.  The one
  remaining gap, named precisely: the Huffman-coded SPECTRUM needs the
  32 tabulated code tables — arbitrary bit-string constants, not
  derivable from structure and not present in this offline container;
  transcribing them from memory would produce silently wrong audio,
  which is worse than an explicit gap.  Frame geometry/duration remains
  fully handled by the frame walk.
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
                "Layer III SPECTRUM decode unsupported: the 32 tabulated "
                "Huffman code tables are not derivable offline (side "
                "info, bit reservoir and scalefactors DO decode — "
                "layer3_side_info / layer3_scalefactors; frame geometry "
                "via mp3_frame_profile)"
            )
        pos += 1
    raise ValueError("no MPEG audio frames found")


# ---------------------------------------------------------------------------
# Layer III side information, bit reservoir and scalefactors (r10)
#
# Everything in a Layer III frame EXCEPT the Huffman-coded spectrum is
# fixed-width fields whose layout the spec states structurally — so it is
# derivable and ground-truthable here.  The spectrum itself needs the 32
# tabulated Huffman code tables (arbitrary bit-string constants, not
# derivable from structure and not available in this offline container);
# that is the one remaining declared gap, and mpeg_audio_decode's error
# names it precisely.  What IS implemented and pinned against the real
# Lavf-encoded fixture: frame walk (multimodal.mp3_frame_profile), side
# information for MPEG-1 and MPEG-2 LSF layouts, the bit-reservoir chain
# (main_data_begin back-pointers resolved against actual frame payloads,
# with the no-overlap and capacity invariants checked), and scalefactor
# decode from the reservoir (MPEG-1 scfsi sharing; LSF scalefac_compress
# partitioning incl. the intensity variants).
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
