import numpy as np

from promptttspp_tpu.utils import (
    make_non_pad_mask, make_pad_mask, pad_list, progress_map,
    repeat_by_durations)


def test_pad_list():
    xs = [np.ones((2, 3)), np.ones((4, 3)) * 2]
    out = pad_list(xs, -1.0)
    assert out.shape == (2, 4, 3)
    assert (out[0, 2:] == -1).all() and (out[1] == 2).all()


def test_repeat_by_durations():
    xs = [np.array([[1.0], [2.0]])]
    out = repeat_by_durations(xs, [np.array([2, 3])])
    np.testing.assert_allclose(out[0, :, 0], [1, 1, 2, 2, 2])


def test_pad_masks():
    m = make_pad_mask([2, 3], maxlen=4)
    np.testing.assert_array_equal(m, [[0, 0, 1, 1], [0, 0, 0, 1]])
    np.testing.assert_array_equal(make_non_pad_mask([2, 3], 4), ~m)


def test_progress_map():
    out = progress_map(lambda x: x * 2, range(10), n_jobs=3)
    assert out == [x * 2 for x in range(10)]
