import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.ops import (
    expand_by_durations,
    generate_path,
    sequence_mask,
    to_log_scale,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]],
    )


def test_generate_path_matches_naive():
    rng = np.random.RandomState(0)
    B, Tp, Tf = 3, 7, 25
    lens = rng.randint(3, Tp + 1, size=B)
    durs = rng.randint(1, 5, size=(B, Tp))
    mask = np.arange(Tp)[None] < lens[:, None]
    durs = durs * mask

    path = np.asarray(
        generate_path(jnp.asarray(durs), jnp.asarray(mask), Tf)
    )

    # naive: frame f belongs to phone p iff cum[p-1] <= f < cum[p]
    for b in range(B):
        cum = np.concatenate([[0], np.cumsum(durs[b])])
        for p in range(Tp):
            for f in range(Tf):
                expect = float(cum[p] <= f < cum[p + 1]) * mask[b, p]
                assert path[b, p, f] == expect, (b, p, f)


def test_expand_by_durations_repeats():
    x = jnp.array([[[1.0], [2.0], [3.0]]])  # [1, 3, 1]
    durs = jnp.array([[2, 1, 3]])
    mask = jnp.ones((1, 3), bool)
    out = expand_by_durations(x, durs, mask, 8)
    np.testing.assert_allclose(
        np.asarray(out)[0, :, 0], [1, 1, 2, 3, 3, 3, 0, 0]
    )


def test_to_log_scale():
    x = jnp.array([0.0, 1.0, np.e])
    out = np.asarray(to_log_scale(x))
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-4)
