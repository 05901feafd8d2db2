"""Kaldi ark/scp IO (`kaldi_io.py`): binary round-trips (float32/
float64 matrices, float/int vectors), scp offset resolution,
text-mode reading, loud failures."""
import numpy as np
import pytest

from torchaudio_contrib_tpu import kaldi_io as K


@pytest.fixture()
def mats():
    rng = np.random.default_rng(0)
    return [("utt1", rng.standard_normal((5, 13)).astype(np.float32)),
            ("utt2", rng.standard_normal((3, 13)).astype(np.float32))]


def test_mat_ark_round_trip(tmp_path, mats):
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    K.write_mat_ark(ark, mats, scp_path=scp)
    got = list(K.read_mat_ark(ark))
    assert [k for k, _ in got] == ["utt1", "utt2"]
    for (_, a), (_, b) in zip(got, mats):
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.float32
    # scp resolves to identical matrices (any order of access)
    got_scp = dict(K.read_mat_scp(scp))
    for k, m in mats:
        np.testing.assert_array_equal(got_scp[k], m)


def test_double_matrix_round_trip(tmp_path):
    ark = str(tmp_path / "d.ark")
    m = np.arange(12, dtype=np.float64).reshape(3, 4) / 7.0
    K.write_mat_ark(ark, [("x", m)])
    (_, got), = K.read_mat_ark(ark)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, m)


def test_vec_flt_round_trip(tmp_path):
    ark = str(tmp_path / "v.ark")
    scp = str(tmp_path / "v.scp")
    items = [("a", np.linspace(-1, 1, 7).astype(np.float32)),
             ("b", np.ones(3, np.float64))]
    K.write_vec_flt_ark(ark, items, scp_path=scp)
    got = list(K.read_vec_flt_ark(ark))
    np.testing.assert_array_equal(got[0][1], items[0][1])
    assert got[1][1].dtype == np.float64
    got_scp = dict(K.read_vec_flt_scp(scp))
    np.testing.assert_array_equal(got_scp["a"], items[0][1])


def test_vec_int_round_trip(tmp_path):
    ark = str(tmp_path / "ali.ark")
    items = [("utt1", np.asarray([0, 3, 3, 7, 2], np.int32)),
             ("utt2", np.asarray([], np.int32))]
    K.write_vec_int_ark(ark, items)
    got = list(K.read_vec_int_ark(ark))
    np.testing.assert_array_equal(got[0][1], items[0][1])
    assert got[0][1].dtype == np.int32
    assert got[1][1].size == 0


def test_text_mode_reading(tmp_path):
    p = tmp_path / "text.ark"
    p.write_text("utt1  [\n  1 2 3\n  4 5 6 ]\n"
                 "utt2  [ 7 8 9 ]\n")
    got = list(K.read_mat_ark(str(p)))
    np.testing.assert_array_equal(got[0][1],
                                  [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(got[1][1], [[7, 8, 9]])
    # int alignment in text form
    a = tmp_path / "ali.txt"
    a.write_text("u1 1 1 2 5\n")
    (_, ali), = K.read_vec_int_ark(str(a))
    np.testing.assert_array_equal(ali, [1, 1, 2, 5])


def test_errors(tmp_path, mats):
    with pytest.raises(ValueError, match="bad Kaldi key"):
        K.write_mat_ark(str(tmp_path / "x.ark"), [("a b", mats[0][1])])
    with pytest.raises(ValueError, match="2-D"):
        K.write_mat_ark(str(tmp_path / "y.ark"),
                        [("a", np.zeros(3))])
    # compressed matrices refused loudly
    p = tmp_path / "cm.ark"
    p.write_bytes(b"utt1 \x00BCM 1234")
    with pytest.raises(ValueError, match="compressed"):
        list(K.read_mat_ark(str(p)))
    # unknown type tag
    q = tmp_path / "zz.ark"
    q.write_bytes(b"utt1 \x00BZZ 1234")
    with pytest.raises(ValueError, match="unknown Kaldi object"):
        list(K.read_mat_ark(str(q)))
    # scp without offset
    s = tmp_path / "bad.scp"
    s.write_text("utt1 /nowhere.ark\n")
    with pytest.raises(ValueError, match="offset"):
        list(K.read_mat_scp(str(s)))


def test_interop_with_compliance_kaldi(tmp_path):
    """fbank features written as an ark read back bit-exact."""
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu.compliance import kaldi as CK
    wav = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((1, 4000)) * 0.1, jnp.float32)
    feats = np.asarray(CK.fbank(wav, sample_frequency=16000.0))
    ark = str(tmp_path / "fb.ark")
    K.write_mat_ark(ark, [("utt1", feats[0] if feats.ndim == 3
                           else feats)])
    (_, got), = K.read_mat_ark(ark)
    np.testing.assert_array_equal(
        got, feats[0] if feats.ndim == 3 else feats)


def test_truncated_ark_raises(tmp_path):
    """EOF inside a key (partial download / corruption) raises instead
    of yielding a phantom entry with a bogus key and empty matrix."""
    from torchaudio_contrib_tpu import kaldi_io as kio
    path = str(tmp_path / "t.ark")
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    kio.write_mat_ark(path, [("u1", m), ("u2", m)])
    data = open(path, "rb").read()
    # cut just after the first byte of the second key
    second = data.index(b"u2 ")
    open(path, "wb").write(data[:second + 1])
    it = kio.read_mat_ark(path)
    k, got = next(it)
    assert k == "u1"
    np.testing.assert_array_equal(got, m)
    with pytest.raises(ValueError, match="truncated"):
        next(it)


def test_writer_rejects_control_char_keys(tmp_path):
    """Keys with embedded newline/tab would silently corrupt both the
    archive (the reader skips \\n) and the scp index."""
    from torchaudio_contrib_tpu import kaldi_io as kio
    m = np.zeros((2, 2), np.float32)
    for bad in ("a\nb", "a\tb", "a\rb", "", "a b"):
        with pytest.raises(ValueError, match="bad Kaldi key"):
            kio.write_mat_ark(str(tmp_path / "x.ark"), [(bad, m)])
