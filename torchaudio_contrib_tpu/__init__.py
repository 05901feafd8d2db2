"""torchaudio_contrib_tpu — TPU-native differentiable audio transforms.

A ground-up JAX/XLA rebuild of the capability surface of
``keunwoochoi/torchaudio-contrib`` (see SURVEY.md): a functional core
(:mod:`.ops`), a composable layer API (:mod:`.models`), and batch/corpus
sharding utilities (:mod:`.parallel`).  Flat re-exports below mirror the
reference's ``__init__.py`` convention [SURVEY.md §2 #15].
"""

__version__ = "0.1.0"

from . import ops, models, parallel, utils, io, compliance

# functional core (flat, reference-style)
from .ops import (
    stft, istft, frame_signal, num_frames, stft_output_length,
    complex_norm, angle, magphase,
    hertz_to_mel, mel_to_hertz, create_mel_filter, create_linear_filter, apply_filterbank,
    amplitude_to_db, db_to_amplitude,
    mu_law_encoding, mu_law_decoding,
    phase_vocoder, compute_phase_advance,
    fused_melspectrogram, fused_mel_supported, resolve_precision,
    griffin_lim,
    create_inverse_mel_filter, mel_to_linear, mel_to_audio,
    resample,
    create_dct, mfcc, lfcc,
    mask_along_axis, time_mask, freq_mask,
    pitch_shift,
    compute_deltas, preemphasis, deemphasis,
    spectral_centroid, spectral_bandwidth, spectral_rolloff,
    spectral_flatness, zero_crossing_rate,
    lfilter, filtfilt, biquad, lowpass_biquad, highpass_biquad,
    bandpass_biquad, bandreject_biquad, allpass_biquad,
    equalizer_biquad, bass_biquad, treble_biquad,
    loudness, a_weighting,
    create_chroma_filter,
    cqt_frequencies, create_cqt_kernel, cqt, pseudo_cqt,
    detect_pitch_frequency,
    fade, gain, dither, dcshift, sliding_window_cmn,
    add_noise, speed,
    overdrive, contrast, phaser, flanger,
    vad, vad_onset,
    convolve, fftconvolve, simulate_rir_ism,
    forced_align, merge_tokens, TokenSpan,
    edit_distance, edit_distance_batched, rnnt_loss,
    ctc_greedy_decode, ctc_prefix_beam_search, CTCHypothesis,
    psd, mvdr_weights_souden, mvdr_weights_rtf,
    rtf_evd, rtf_power, apply_beamforming,
    hann_window, hamming_window, blackman_window, get_window,
)

# layer API (flat, reference-style)
from .models import (
    MFCC, Loudness, PitchShift, Speed, AddNoise,
    Fade, Vol, FrequencyMasking, TimeMasking,
    Preemphasis, Deemphasis, ComputeDeltas, SlidingWindowCmn,
    SpectralCentroid, InverseMelScale,
    PSD, SoudenMVDR, RTFMVDR, Vad,
    Overdrive, Phaser, Flanger, Contrast,
    Lowpass, Highpass, Equalizer, RNNTLoss,
    LFCC, Convolve, FFTConvolve, SpeedPerturbation,
    Transform, Pipeline,
    STFT, ISTFT, ComplexNorm,
    Filterbank, MelFilterbank, ChromaFilterbank, ApplyFilterbank,
    AmplitudeToDb, DbToAmplitude,
    MuLawEncoding, MuLawDecoding,
    StretchSpecTime, Resample, GriffinLim,
    Spectrogram, Melspectrogram, FusedMelspectrogram,
    MelFrontendClassifier, Conformer,
)

from .utils import view_as_real, view_as_complex

__all__ = [
    "ops", "models", "parallel", "utils", "io", "compliance",
    "stft", "istft", "frame_signal", "num_frames", "stft_output_length",
    "complex_norm", "angle", "magphase",
    "hertz_to_mel", "mel_to_hertz", "create_mel_filter", "create_linear_filter", "apply_filterbank",
    "amplitude_to_db", "db_to_amplitude",
    "mu_law_encoding", "mu_law_decoding",
    "phase_vocoder", "compute_phase_advance",
    "fused_melspectrogram", "fused_mel_supported",
    "resolve_precision",
    "griffin_lim",
    "create_inverse_mel_filter", "mel_to_linear", "mel_to_audio",
    "resample",
    "create_dct", "mfcc", "lfcc",
    "mask_along_axis", "time_mask", "freq_mask",
    "pitch_shift",
    "compute_deltas", "preemphasis", "deemphasis",
    "spectral_centroid", "spectral_bandwidth", "spectral_rolloff",
    "spectral_flatness", "zero_crossing_rate",
    "lfilter", "filtfilt", "biquad", "lowpass_biquad", "highpass_biquad",
    "bandpass_biquad", "bandreject_biquad", "allpass_biquad",
    "equalizer_biquad", "bass_biquad", "treble_biquad",
    "loudness", "a_weighting",
    "create_chroma_filter",
    "cqt_frequencies", "create_cqt_kernel", "cqt", "pseudo_cqt",
    "detect_pitch_frequency",
    "fade", "gain", "dither", "dcshift", "sliding_window_cmn",
    "add_noise", "speed",
    "overdrive", "contrast", "phaser", "flanger",
    "vad", "vad_onset",
    "convolve", "fftconvolve", "simulate_rir_ism",
    "forced_align", "merge_tokens", "TokenSpan",
    "edit_distance", "edit_distance_batched", "rnnt_loss",
    "ctc_greedy_decode", "ctc_prefix_beam_search", "CTCHypothesis",
    "psd", "mvdr_weights_souden", "mvdr_weights_rtf",
    "rtf_evd", "rtf_power", "apply_beamforming",
    "hann_window", "hamming_window", "blackman_window", "get_window",
    "Transform", "Pipeline",
    "STFT", "ISTFT", "ComplexNorm",
    "Filterbank", "MelFilterbank", "ChromaFilterbank", "ApplyFilterbank",
    "AmplitudeToDb", "DbToAmplitude",
    "MuLawEncoding", "MuLawDecoding",
    "StretchSpecTime", "Resample", "GriffinLim",
    "Spectrogram", "Melspectrogram", "FusedMelspectrogram",
    "MelFrontendClassifier", "Conformer",
    "MFCC", "Loudness", "PitchShift", "Speed", "AddNoise",
    "Fade", "Vol", "FrequencyMasking", "TimeMasking",
    "Preemphasis", "Deemphasis", "ComputeDeltas", "SlidingWindowCmn",
    "SpectralCentroid", "InverseMelScale",
    "PSD", "SoudenMVDR", "RTFMVDR", "Vad",
    "Overdrive", "Phaser", "Flanger", "Contrast",
    "Lowpass", "Highpass", "Equalizer", "RNNTLoss",
    "LFCC", "Convolve", "FFTConvolve", "SpeedPerturbation",
    "view_as_real", "view_as_complex",
]
