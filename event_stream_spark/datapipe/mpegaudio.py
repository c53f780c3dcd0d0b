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
- **Layer II/III sample decode stays declared-unsupported**
  (``NotImplementedError``): Layer II's bit-allocation tables
  (ISO 11172-3 B.2a-d) and Layer III's Huffman tables are pages of
  tabulated constants; transcribing them from memory would produce
  silently wrong audio, which is worse than an explicit gap.  The
  round-7 re-evaluation confirmed the gap must stay: this container
  ships no reference encoder (no ffmpeg/twolame/lame) and no Layer II
  fixture, so transcribed tables could not be ground-truthed against a
  real encoded stream — unverifiable tables don't ship.  Their frame
  geometry/duration remains fully handled by the frame walk.
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
