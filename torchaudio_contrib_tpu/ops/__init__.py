"""Functional core: pure, differentiable, jit-friendly audio transforms.

Mirrors the reference's ``torchaudio_contrib/functional.py`` +
``istft.py`` capability surface [SURVEY.md §2 components 1-8] as native
JAX ops designed for TPU (static shapes, MXU GEMMs, XLA FFT, associative
scans).
"""
from .windows import (
    hann_window,
    hamming_window,
    blackman_window,
    bartlett_window,
    kaiser_window,
    nuttall_window,
    rectangular_window,
    get_window,
    cola_window_sum,
    check_nola,
)
from .stft import stft, istft, frame_signal, num_frames, stft_output_length
from .spectro import spectrogram, melspectrogram, inverse_spectrogram
from .complexops import complex_norm, angle, magphase
from .filters import (
    hertz_to_mel,
    mel_to_hertz,
    hertz_to_bark,
    bark_to_hertz,
    create_mel_filter,
    create_linear_filter,
    create_bark_filter,
    melscale_fbanks,
    linear_fbanks,
    barkscale_fbanks,
    apply_filterbank,
)
from .db import (amplitude_to_db, db_to_amplitude,
                 amplitude_to_DB, DB_to_amplitude)
from .mulaw import mu_law_encoding, mu_law_decoding
from .phase_vocoder import phase_vocoder, compute_phase_advance
from .fused import (fused_melspectrogram, fused_mel_supported,
                    resolve_precision)
from .griffinlim import griffin_lim
# torchaudio.functional spells it without the underscore
griffinlim = griffin_lim
from .fused_griffinlim import fused_gl_supported
from .melinv import (create_inverse_mel_filter,
                     create_inverse_bark_filter, mel_to_linear,
                     mel_to_audio)
from .resample import resample
from .mfcc import create_dct, mfcc, lfcc
from .augment import (mask_along_axis, mask_along_axis_iid,
                      time_mask, freq_mask)
from .pitch import pitch_shift
from .features import compute_deltas, preemphasis, deemphasis
from .spectral import (spectral_centroid, spectral_bandwidth,
                       spectral_rolloff, spectral_flatness,
                       zero_crossing_rate)
from .iir import (lfilter, filtfilt, biquad, lowpass_biquad, highpass_biquad,
                  bandpass_biquad, bandreject_biquad, allpass_biquad,
                  equalizer_biquad, bass_biquad, treble_biquad,
                  band_biquad, deemph_biquad, riaa_biquad)
from .loudness import loudness, a_weighting
from .chroma import create_chroma_filter, chroma_filterbank
from .cqt import cqt_frequencies, create_cqt_kernel, cqt, pseudo_cqt
from .pitchdetect import detect_pitch_frequency
from .kaldipitch import compute_kaldi_pitch
from .effects import (fade, gain, dither, dcshift, sliding_window_cmn,
                      add_noise, speed, apply_codec)
from .modfx import overdrive, contrast, phaser, flanger
from .vad import vad, vad_onset, vad_trim
from .convolve import convolve, fftconvolve
from .rir import simulate_rir_ism
from .raytrace import ray_tracing
from .dsp import (oscillator_bank, adsr_envelope, extend_pitch,
                  sinc_impulse_response, frequency_impulse_response,
                  filter_waveform, exp_sigmoid)
from .align import forced_align, merge_tokens, TokenSpan
from .edit import edit_distance, edit_distance_batched
from .rnnt import rnnt_loss, rnnt_loss_fused
from .ctcloss import ctc_loss
from .metrics import snr, si_snr, frechet_distance
from .lexdecode import (LexiconTables, CompiledLexicon,
                        compile_lexicon_tables,
                        ctc_lexicon_beam_decode, DeviceCTCDecoder,
                        device_ctc_decoder)
from .ctcdecode import (ctc_greedy_decode, ctc_prefix_beam_search, ctc_beam_decode,
                        CTCHypothesis)
from .beamform import (psd, mvdr_weights_souden, mvdr_weights_rtf,
                       rtf_evd, rtf_power, apply_beamforming)

__all__ = [
    "hann_window", "hamming_window", "blackman_window",
    "bartlett_window", "kaiser_window", "nuttall_window",
    "rectangular_window",
    "get_window", "cola_window_sum", "check_nola",
    "stft", "istft", "frame_signal", "num_frames", "stft_output_length",
    "complex_norm", "angle", "magphase",
    "hertz_to_mel", "mel_to_hertz", "hertz_to_bark", "bark_to_hertz",
    "create_mel_filter", "create_linear_filter", "create_bark_filter",
    "melscale_fbanks", "linear_fbanks", "barkscale_fbanks",
    "apply_filterbank",
    "amplitude_to_db", "db_to_amplitude",
    "amplitude_to_DB", "DB_to_amplitude", "inverse_spectrogram",
    "mu_law_encoding", "mu_law_decoding",
    "phase_vocoder", "compute_phase_advance",
    "fused_melspectrogram", "fused_mel_supported",
    "resolve_precision",
    "griffin_lim", "griffinlim", "fused_gl_supported",
    "create_inverse_mel_filter", "create_inverse_bark_filter",
    "mel_to_linear", "mel_to_audio",
    "resample",
    "create_dct", "mfcc", "lfcc",
    "mask_along_axis", "mask_along_axis_iid", "time_mask", "freq_mask",
    "pitch_shift",
    "compute_deltas", "preemphasis", "deemphasis",
    "spectral_centroid", "spectral_bandwidth", "spectral_rolloff",
    "spectral_flatness", "zero_crossing_rate",
    "spectrogram", "melspectrogram",
    "oscillator_bank", "adsr_envelope", "extend_pitch",
    "sinc_impulse_response", "frequency_impulse_response",
    "filter_waveform",
    "exp_sigmoid",
    "lfilter", "filtfilt", "biquad", "lowpass_biquad", "highpass_biquad",
    "bandpass_biquad", "bandreject_biquad", "allpass_biquad",
    "equalizer_biquad", "bass_biquad", "treble_biquad",
    "band_biquad", "deemph_biquad", "riaa_biquad",
    "loudness", "a_weighting",
    "create_chroma_filter", "chroma_filterbank",
    "cqt_frequencies", "create_cqt_kernel", "cqt", "pseudo_cqt",
    "detect_pitch_frequency",
    "compute_kaldi_pitch",
    "fade", "gain", "dither", "dcshift", "sliding_window_cmn",
    "add_noise", "speed", "apply_codec",
    "overdrive", "contrast", "phaser", "flanger",
    "vad", "vad_onset", "vad_trim",
    "convolve", "fftconvolve", "simulate_rir_ism", "ray_tracing",
    "forced_align", "merge_tokens", "TokenSpan",
    "edit_distance", "edit_distance_batched", "rnnt_loss", "rnnt_loss_fused",
    "ctc_greedy_decode", "ctc_prefix_beam_search", "ctc_beam_decode", "CTCHypothesis",
    "LexiconTables", "CompiledLexicon", "compile_lexicon_tables",
    "ctc_lexicon_beam_decode", "DeviceCTCDecoder", "device_ctc_decoder",
    "ctc_loss", "snr", "si_snr", "frechet_distance",
    "psd", "mvdr_weights_souden", "mvdr_weights_rtf",
    "rtf_evd", "rtf_power", "apply_beamforming",
]
