"""Audio frontend: fused STFT → log-mel → LFR as one jittable JAX program.

Replaces the in-ONNX-graph frontend of the reference
(``fun_asr_gguf/model_definition.py:244-323``): length-aware mean
normalization, pre-emphasis 0.97, STFT (n_fft=400, periodic hamming window,
hop=160, center-padded) computed as a frame-matrix × DFT-matrix product
(MXU-friendly — the reference uses conv1d cos/sin kernels for the same
reason on DML), 80-bin HTK log-mel (20–8000 Hz, +1e-7 floor), and LFR
stacking m=7/n=6 with replicate padding.

Everything is static-shape: audio is padded to a fixed window (the XLA
analogue of the reference's pad-to-60 s DML trick, ``nano_onnx.py:6-19``)
and ``ilens`` carries the true sample count for masking, so one compiled
program serves every utterance length.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 80
    f_min: float = 20.0
    f_max: float = 8000.0
    pre_emphasis: float = 0.97
    lfr_m: int = 7
    lfr_n: int = 6

    @property
    def feat_dim(self) -> int:
        return self.n_mels * self.lfr_m

    def n_mel_frames(self, n_samples: int) -> int:
        return n_samples // self.hop_length + 1

    def n_lfr_frames(self, n_samples: int) -> int:
        t = self.n_mel_frames(n_samples)
        return (t + self.lfr_n - 1) // self.lfr_n


def hamming_window_periodic(win_length: int) -> np.ndarray:
    """torch.hamming_window(N, periodic=True): 0.54 - 0.46 cos(2πn/N)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(cfg: FrontendConfig) -> np.ndarray:
    """HTK-scale triangular mel filterbank, no normalization.

    Matches torchaudio.functional.melscale_fbanks(n_freqs=201, 20, 8000, 80,
    16000, norm=None, mel_scale='htk') as used by the export script
    (``01-Export-Encoder-Adaptor-CTC.py:102``). Returns [n_mels, n_freqs].
    """
    n_freqs = cfg.n_fft // 2 + 1
    all_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_freqs)
    m_min, m_max = _hz_to_mel_htk(cfg.f_min), _hz_to_mel_htk(cfg.f_max)
    m_pts = np.linspace(m_min, m_max, cfg.n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))            # [n_freqs, n_mels]
    return fb.T.astype(np.float32)                        # [n_mels, n_freqs]


def dft_kernels(cfg: FrontendConfig):
    """Windowed real-DFT matrices: returns (cos_k, sin_k) each [n_fft, n_freqs].

    real[t, f] = Σ_n cos(2πfn/N)·w[n]·frame[t, n]; imag uses -sin. Laid out
    for a frames[T, n_fft] @ kernel[n_fft, n_freqs] MXU matmul.
    """
    n_fft = cfg.n_fft
    window = hamming_window_periodic(cfg.win_length)
    if cfg.win_length < n_fft:
        lp = (n_fft - cfg.win_length) // 2
        window = np.pad(window, (lp, n_fft - cfg.win_length - lp))
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    omega = 2.0 * np.pi * f * t / n_fft
    cos_k = (np.cos(omega) * window[:, None]).astype(np.float32)
    sin_k = (-np.sin(omega) * window[:, None]).astype(np.float32)
    return cos_k, sin_k


def frontend_constants(cfg: FrontendConfig):
    """Numpy constants consumed by :func:`compute_lfr_features`."""
    cos_k, sin_k = dft_kernels(cfg)
    fbank = mel_filterbank(cfg)
    return {"cos_k": cos_k, "sin_k": sin_k, "fbank": fbank}


@partial(jax.jit, static_argnames=("cfg",))
def compute_lfr_features(consts, audio: jnp.ndarray, ilens: jnp.ndarray,
                         cfg: FrontendConfig = FrontendConfig()):
    """audio [B, N] float32 (static N), ilens [B] int32 → (x, mask).

    Returns LFR features x [B, T_lfr, n_mels*lfr_m] float32 and frame mask
    [B, T_lfr] float32 where T_lfr = ceil((N//hop + 1) / lfr_n).
    """
    B, N = audio.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft
    half = n_fft // 2
    t_phys = N // hop + 1
    t_lfr_phys = (t_phys + cfg.lfr_n - 1) // cfg.lfr_n

    ilens = ilens.astype(jnp.int32)
    sample_idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    smask = (sample_idx < ilens[:, None]).astype(audio.dtype)

    # 1. length-aware mean normalization + pre-emphasis (re-masked)
    audio = audio * smask
    mean = jnp.sum(audio, axis=1, keepdims=True) / jnp.maximum(
        ilens[:, None].astype(audio.dtype), 1.0)
    audio = (audio - mean) * smask
    if cfg.pre_emphasis > 0:
        audio = jnp.concatenate(
            [audio[:, :1], audio[:, 1:] - cfg.pre_emphasis * audio[:, :-1]],
            axis=1) * smask

    # 2. windowed DFT as ONE strided conv per kernel (no index gathers —
    # XLA TPU gathers are slow; convs map onto the MXU, mirroring the
    # reference's conv1d-STFT trick for DML, model_definition.py:244-256)
    padded = jnp.pad(audio, ((0, 0), (half, half)))[:, :, None]  # [B,N',1]
    def dft(kernel):
        return jax.lax.conv_general_dilated(
            padded, kernel[:, None, :],                # [n_fft, 1, n_freqs]
            window_strides=(hop,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
    real = dft(consts["cos_k"])
    imag = dft(consts["sin_k"])
    power = real * real + imag * imag                  # [B, T, n_freqs]
    mel = jnp.log(power @ consts["fbank"].T + 1e-7)    # [B, T, n_mels]

    # 3. LFR with replicate padding; valid-region consistency without
    # gathers: frames past t_mel_valid-1 are overwritten by the last valid
    # frame (one dynamic_slice per sample), then 7 strided slices stack LFR.
    t_mel_valid = ilens // hop + 1                     # [B]
    last_valid = jax.vmap(
        lambda m, idx: jax.lax.dynamic_slice_in_dim(m, idx, 1, axis=0)
    )(mel, t_mel_valid - 1)                            # [B, 1, n_mels]
    mel_pos = jnp.arange(t_phys, dtype=jnp.int32)[None, :, None]
    mel_c = jnp.where(mel_pos < t_mel_valid[:, None, None], mel, last_valid)

    m_half = (cfg.lfr_m - 1) // 2
    right_pad = t_lfr_phys * cfg.lfr_n + cfg.lfr_m - t_phys
    padded_mel = jnp.concatenate(
        [jnp.repeat(mel_c[:, :1], m_half, axis=1),
         mel_c,
         jnp.repeat(mel_c[:, -1:], right_pad, axis=1)], axis=1)
    x = jnp.concatenate(
        [jax.lax.slice_in_dim(padded_mel, i, i + t_lfr_phys * cfg.lfr_n,
                              stride=cfg.lfr_n, axis=1)
         for i in range(cfg.lfr_m)], axis=-1)          # [B, T_lfr, m*n_mels]

    t_lfr_valid = (t_mel_valid + cfg.lfr_n - 1) // cfg.lfr_n
    mask = (jnp.arange(t_lfr_phys, dtype=jnp.int32)[None, :]
            < t_lfr_valid[:, None]).astype(x.dtype)
    return x * mask[:, :, None], mask


def audio_token_length(n_valid_samples: int, cfg: FrontendConfig = FrontendConfig()) -> int:
    """Valid LLM audio-embedding length for a true sample count.

    Mirrors the reference trim formula (``nano_onnx.py:124-127`` /
    ``model_definition.py:317-318``): two stride-2-style reductions on the
    valid LFR length. 60 s → 126 tokens.
    """
    t_mel = n_valid_samples // cfg.hop_length + 1
    t_lfr = (t_mel + cfg.lfr_n - 1) // cfg.lfr_n
    olens_1 = 1 + (t_lfr - 3 + 2) // 2
    return (1 + (olens_1 - 3 + 2) // 2 - 1) // 2 + 1


def audio_token_length_jnp(ilens: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()):
    """Traced variant of :func:`audio_token_length` for in-graph masking."""
    t_mel = ilens // cfg.hop_length + 1
    t_lfr = (t_mel + cfg.lfr_n - 1) // cfg.lfr_n
    olens_1 = 1 + (t_lfr - 1) // 2
    return (1 + (olens_1 - 1) // 2 - 1) // 2 + 1
