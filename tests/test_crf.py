"""Linear-chain CRF duration head (ops/crf.py, dur_loss: crf).

Reference gates this behind hparams['dur_loss']=='crf' and uses torchcrf
(modules/fastspeech/tts_modules.py:100-103,130; tasks/tts/fs2.py:200-202).
torchcrf is not available here; the oracle is brute-force enumeration over all
tag paths, which pins the same semantics (score, partition, Viterbi, masking,
end-transitions at the last valid step)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.models.predictors import DurationPredictor
from diffsinger_tpu.ops.crf import (crf_log_partition, crf_score, crf_viterbi)
from diffsinger_tpu.training import losses as L


def _brute_force(emissions, mask, start, end, trans):
    """All-path scores per batch row -> (logZ [B], best_path [B] list, best [B])."""
    b, t, k = emissions.shape
    logzs, best_paths = [], []
    for i in range(b):
        n_valid = int(mask[i].sum())
        scores, paths = [], []
        for path in itertools.product(range(k), repeat=n_valid):
            s = start[path[0]] + emissions[i, 0, path[0]]
            for j in range(1, n_valid):
                s += trans[path[j - 1], path[j]] + emissions[i, j, path[j]]
            s += end[path[-1]]
            scores.append(s)
            paths.append(path)
        scores = np.array(scores)
        logzs.append(np.log(np.exp(scores - scores.max()).sum()) + scores.max())
        best_paths.append(paths[int(scores.argmax())])
    return np.array(logzs), best_paths


def _rand_crf(seed, b=2, t=4, k=3):
    rng = np.random.RandomState(seed)
    emissions = rng.randn(b, t, k).astype(np.float32)
    start = rng.randn(k).astype(np.float32) * 0.3
    end = rng.randn(k).astype(np.float32) * 0.3
    trans = rng.randn(k, k).astype(np.float32) * 0.3
    mask = np.ones((b, t), bool)
    mask[1, t - 1 :] = False  # ragged batch: row 1 one step shorter
    return emissions, mask, start, end, trans


def test_log_partition_matches_enumeration():
    emissions, mask, start, end, trans = _rand_crf(0)
    logz = crf_log_partition(jnp.asarray(emissions), jnp.asarray(mask),
                             jnp.asarray(start), jnp.asarray(end),
                             jnp.asarray(trans))
    ref, _ = _brute_force(emissions, mask, start, end, trans)
    np.testing.assert_allclose(np.asarray(logz), ref, rtol=1e-5)


def test_score_and_log_likelihood():
    emissions, mask, start, end, trans = _rand_crf(1)
    b, t, k = emissions.shape
    rng = np.random.RandomState(7)
    tags = rng.randint(0, k, size=(b, t))
    score = crf_score(jnp.asarray(emissions), jnp.asarray(tags),
                      jnp.asarray(mask), jnp.asarray(start), jnp.asarray(end),
                      jnp.asarray(trans))
    # manual path score, honoring mask + end at last valid step
    for i in range(b):
        n_valid = int(mask[i].sum())
        s = start[tags[i, 0]] + emissions[i, 0, tags[i, 0]]
        for j in range(1, n_valid):
            s += trans[tags[i, j - 1], tags[i, j]] + emissions[i, j, tags[i, j]]
        s += end[tags[i, n_valid - 1]]
        np.testing.assert_allclose(float(score[i]), s, rtol=1e-5)


def test_viterbi_matches_enumeration():
    emissions, mask, start, end, trans = _rand_crf(2)
    path = crf_viterbi(jnp.asarray(emissions), jnp.asarray(mask),
                       jnp.asarray(start), jnp.asarray(end), jnp.asarray(trans))
    _, best = _brute_force(emissions, mask, start, end, trans)
    path = np.asarray(path)
    for i, bp in enumerate(best):
        np.testing.assert_array_equal(path[i, : len(bp)], np.array(bp))


def test_dur_predictor_crf_head_shapes_and_decode():
    dp = DurationPredictor(channels=16, num_layers=2, dur_loss="crf")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 16).astype(np.float32))
    pad = jnp.asarray(np.array([[False] * 6, [False] * 4 + [True] * 2]))
    variables = dp.init(jax.random.PRNGKey(0), x, pad)
    assert variables["params"]["crf"]["transitions"].shape == (32, 32)
    out = dp.apply(variables, x, pad)
    assert out.shape == (2, 6, 32)  # emissions, not squeezed
    dur, out2 = dp.apply(variables, x, pad, infer=True)
    assert dur.shape == (2, 6) and dur.dtype == jnp.int32
    assert int(dur[1, 4]) == 0 and int(dur[1, 5]) == 0  # padded -> zeroed
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_crf_duration_loss_differentiable():
    rng = np.random.RandomState(3)
    b, t, k = 2, 5, 32
    txt = np.array([[3, 4, 5, 6, 7], [3, 4, 5, 0, 0]])
    mel2ph = np.array([[1, 1, 2, 3, 3, 4, 5, 5], [1, 2, 2, 3, 3, 0, 0, 0]])
    crf_params = {
        "start_transitions": jnp.asarray(rng.randn(k).astype(np.float32) * 0.1),
        "end_transitions": jnp.asarray(rng.randn(k).astype(np.float32) * 0.1),
        "transitions": jnp.asarray(rng.randn(k, k).astype(np.float32) * 0.1),
    }

    def loss_fn(emissions, crf_params):
        losses = {}
        L.duration_losses(losses, emissions, jnp.asarray(mel2ph),
                          jnp.asarray(txt), jnp.zeros((b, t)),
                          dur_loss="crf", crf_params=crf_params)
        assert set(losses) == {"pdur"}  # wdur/sdur skipped under crf
        return losses["pdur"]

    emissions = jnp.asarray(rng.randn(b, t, k).astype(np.float32))
    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(emissions, crf_params)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grads[0]).sum())
    assert np.isfinite(np.asarray(grads[1]["transitions"]).sum())


def test_dur_predictor_mog_head_raises():
    dp = DurationPredictor(channels=16, num_layers=1, dur_loss="mog")
    x = jnp.zeros((1, 4, 16))
    variables = dp.init(jax.random.PRNGKey(0), x)
    out = dp.apply(variables, x)
    assert out.shape == (1, 4, 15)  # odim=15, reference tts_modules.py:98-99
    with pytest.raises(NotImplementedError):
        dp.apply(variables, x, infer=True)
