"""Linear-chain CRF for the duration predictor's ``dur_loss: crf`` head.

The reference gates this behind ``hparams['dur_loss'] == 'crf'`` and delegates to
the external ``torchcrf`` package (modules/fastspeech/tts_modules.py:100-103,130;
loss at tasks/tts/fs2.py:200-202: ``-crf(dur_pred, dur_gt.clamp(0,31),
mask=nonpadding>0, reduction='mean')``). Here it is a native JAX implementation:
the forward (partition) recursion and Viterbi decode are ``lax.scan``s over the
time axis, so both compile to static-shape TPU programs and batch over B on the
VPU/MXU via a single [B, K, K] broadcast per step.

Semantics match torchcrf (v0.7.2):
  * params: ``start_transitions [K]``, ``end_transitions [K]``,
    ``transitions [K, K]`` (from-tag, to-tag), all init U(-0.1, 0.1);
  * ``log_likelihood`` = score(tags) - logZ, per sequence; masked steps are
    skipped; ``end_transitions`` applies at each sequence's last *valid* step;
  * ``decode`` = Viterbi argmax path over valid steps (mask[:, 0] must be on,
    as torchcrf requires).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def crf_score(emissions: jnp.ndarray, tags: jnp.ndarray, mask: jnp.ndarray,
              start: jnp.ndarray, end: jnp.ndarray,
              transitions: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized score of a tag path. emissions [B,T,K], tags [B,T] int,
    mask [B,T] (1=valid, mask[:,0] all 1) -> [B]."""
    b, t, k = emissions.shape
    maskf = mask.astype(emissions.dtype)
    first_tag = tags[:, 0]
    score = start[first_tag] + jnp.take_along_axis(
        emissions[:, 0], first_tag[:, None], axis=1)[:, 0]
    if t > 1:
        prev_tags, cur_tags = tags[:, :-1], tags[:, 1:]
        trans = transitions[prev_tags, cur_tags]                      # [B, T-1]
        emit = jnp.take_along_axis(emissions[:, 1:], cur_tags[..., None],
                                   axis=2)[..., 0]                    # [B, T-1]
        score = score + ((trans + emit) * maskf[:, 1:]).sum(-1)
    # tag at the last valid position
    last_idx = maskf.sum(-1).astype(jnp.int32) - 1                    # [B]
    last_tag = jnp.take_along_axis(tags, last_idx[:, None], axis=1)[:, 0]
    return score + end[last_tag]


def crf_log_partition(emissions: jnp.ndarray, mask: jnp.ndarray,
                      start: jnp.ndarray, end: jnp.ndarray,
                      transitions: jnp.ndarray) -> jnp.ndarray:
    """log Z via the forward algorithm (one lax.scan over T). -> [B]."""
    alpha0 = start[None, :] + emissions[:, 0]                         # [B, K]

    def step(alpha, inp):
        emis_t, mask_t = inp                                          # [B,K], [B]
        nxt = jax.nn.logsumexp(
            alpha[:, :, None] + transitions[None] + emis_t[:, None, :], axis=1)
        return jnp.where(mask_t[:, None], nxt, alpha), None

    xs = (jnp.swapaxes(emissions[:, 1:], 0, 1), jnp.swapaxes(mask[:, 1:], 0, 1))
    alpha, _ = jax.lax.scan(step, alpha0, xs)
    return jax.nn.logsumexp(alpha + end[None, :], axis=-1)


def crf_viterbi(emissions: jnp.ndarray, mask: jnp.ndarray, start: jnp.ndarray,
                end: jnp.ndarray, transitions: jnp.ndarray) -> jnp.ndarray:
    """Best tag path [B, T] (padded steps repeat the last valid tag; callers
    mask them out exactly as the reference multiplies durations by nonpadding)."""
    b, t, k = emissions.shape
    score0 = start[None, :] + emissions[:, 0]                         # [B, K]

    def fwd(score, inp):
        emis_t, mask_t = inp
        cand = score[:, :, None] + transitions[None] + emis_t[:, None, :]
        best_prev = jnp.argmax(cand, axis=1)                          # [B, K]
        best_score = jnp.max(cand, axis=1)
        # masked steps: carry score, identity backpointer
        ident = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
        return (jnp.where(mask_t[:, None], best_score, score),
                jnp.where(mask_t[:, None], best_prev, ident))

    xs = (jnp.swapaxes(emissions[:, 1:], 0, 1), jnp.swapaxes(mask[:, 1:], 0, 1))
    final, backptrs = jax.lax.scan(fwd, score0, xs)                   # [T-1,B,K]
    last_tag = jnp.argmax(final + end[None, :], axis=-1)              # [B]

    def back(tag, bp_t):
        prev = jnp.take_along_axis(bp_t, tag[:, None], axis=1)[:, 0]
        return prev, tag

    first_tag, path_tail = jax.lax.scan(back, last_tag, backptrs, reverse=True)
    return jnp.concatenate([first_tag[:, None],
                            jnp.swapaxes(path_tail, 0, 1)], axis=1)


class LinearChainCRF(nn.Module):
    """Flax wrapper holding the three transition tables."""

    num_tags: int

    def setup(self):
        init = lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                     -0.1, 0.1)
        self.start_transitions = self.param("start_transitions", init,
                                            (self.num_tags,))
        self.end_transitions = self.param("end_transitions", init,
                                          (self.num_tags,))
        self.transitions = self.param("transitions", init,
                                      (self.num_tags, self.num_tags))

    def log_likelihood(self, emissions: jnp.ndarray, tags: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
        """Per-sequence log p(tags | emissions). -> [B]."""
        return (crf_score(emissions, tags, mask, self.start_transitions,
                          self.end_transitions, self.transitions)
                - crf_log_partition(emissions, mask, self.start_transitions,
                                    self.end_transitions, self.transitions))

    def decode(self, emissions: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        return crf_viterbi(emissions, mask, self.start_transitions,
                           self.end_transitions, self.transitions)

    def materialize(self):
        """Touch/return the tables — lets a parent module force param creation
        on paths that don't run the CRF itself (e.g. training emissions-only)."""
        return self.start_transitions, self.end_transitions, self.transitions

    def __call__(self, emissions, tags, mask):  # pragma: no cover - init only
        return self.log_likelihood(emissions, tags, mask)
