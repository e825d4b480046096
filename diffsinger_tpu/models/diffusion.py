"""Gaussian (shallow) diffusion over mel-spectrograms with DDPM and PLMS samplers.

Behavioral parity: usr/diff/shallow_diffusion_tts.py (GaussianDiffusion,
OfflineGaussianDiffusion) — beta schedules (:44-68), q/posterior buffers
(:103-123), spec min/max normalization (:278-282), training loss on epsilon
(:213-231), shallow boost from the FS2 mel at t=K (:249-255), ``gaussian_start``
(:256-259), DDPM reverse step (:128-166) and PLMS/PNDM multi-step (:168-204).

TPU-first design: the diffusion "model" is just the denoiser (a Flax module);
this file is a *pure functional sampler/loss* over a ``denoise_fn(params, x, t,
cond)`` closure. The entire reverse process is ONE ``lax.scan`` compiled into the
same jit as the conditioner and (optionally) the vocoder — the reference pays a
Python->device round trip per step, which is the main RTF win here. The PLMS
4-deep noise deque becomes a fixed [3, ...] ring buffer in the scan carry with a
``lax.switch`` over Adams-Bashforth orders.

Mel layout is [B, T, M]; the reference's [B, 1, M, T] image layout is a Conv2d
convention, not carried over.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DenoiseFn = Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def linear_beta_schedule(timesteps: int, max_beta: float = 0.01) -> np.ndarray:
    return np.linspace(1e-4, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


BETA_SCHEDULES = {"linear": linear_beta_schedule, "cosine": cosine_beta_schedule}


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    timesteps: int = 100
    k_step: int = 100
    loss_type: str = "l1"
    schedule_type: str = "cosine"
    max_beta: float = 0.01
    spec_min: Tuple[float, ...] = ()
    spec_max: Tuple[float, ...] = ()
    keep_bins: int = 80
    mel_bins: int = 80
    pndm_speedup: int = 0  # 0 = plain DDPM sampling
    gaussian_start: bool = False

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "DiffusionConfig":
        return cls(
            timesteps=int(hp.get("timesteps", 100)),
            k_step=int(hp.get("K_step", hp.get("timesteps", 100))),
            loss_type=hp.get("diff_loss_type", "l1"),
            schedule_type=hp.get("schedule_type", "cosine"),
            max_beta=float(hp.get("max_beta", 0.01)),
            spec_min=tuple(hp.get("spec_min", []) or []),
            spec_max=tuple(hp.get("spec_max", []) or []),
            keep_bins=int(hp.get("keep_bins", 80)),
            mel_bins=int(hp.get("audio_num_mel_bins", 80)),
            pndm_speedup=int(hp.get("pndm_speedup") or 0),
            gaussian_start=bool(hp.get("gaussian_start", False)),
        )


class GaussianDiffusion:
    """Schedule + pure loss/sampling functions around a denoiser apply-fn."""

    def __init__(self, cfg: DiffusionConfig, denoise_fn: DenoiseFn):
        self.cfg = cfg
        self.denoise_fn = denoise_fn
        if cfg.schedule_type == "linear":
            betas = linear_beta_schedule(cfg.timesteps, cfg.max_beta)
        else:
            betas = cosine_beta_schedule(cfg.timesteps)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        # q(x_t | x_0) and posterior q(x_{t-1} | x_t, x_0) coefficients
        # (reference shallow_diffusion_tts.py:103-123)
        self.betas = betas
        self.alphas_cumprod = alphas_cumprod
        self.sqrt_alphas_cumprod = np.sqrt(alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / alphas_cumprod - 1)
        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        self.posterior_variance = posterior_variance
        self.posterior_log_variance_clipped = np.log(np.maximum(posterior_variance,
                                                                1e-20))
        self.posterior_mean_coef1 = (betas * np.sqrt(alphas_cumprod_prev)
                                     / (1.0 - alphas_cumprod))
        self.posterior_mean_coef2 = ((1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
                                     / (1.0 - alphas_cumprod))
        if cfg.spec_min and cfg.spec_max:
            self._spec_min = np.asarray(cfg.spec_min, np.float32)[: cfg.keep_bins]
            self._spec_max = np.asarray(cfg.spec_max, np.float32)[: cfg.keep_bins]
        else:  # identity codec when stats are absent (legacy DiffFsTask configs)
            self._spec_min = np.full((cfg.keep_bins,), -1.0, np.float32)
            self._spec_max = np.full((cfg.keep_bins,), 1.0, np.float32)

    @staticmethod
    def _extract(a: np.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Gather per-timestep coefficients, broadcast over [B, T, M]. t: [B]."""
        return jnp.asarray(a, jnp.float32)[t][:, None, None]

    # ------------------------------------------------------------- spec codec
    def norm_spec(self, x):
        lo, hi = jnp.asarray(self._spec_min), jnp.asarray(self._spec_max)
        return (x - lo) / (hi - lo) * 2 - 1

    def denorm_spec(self, x):
        lo, hi = jnp.asarray(self._spec_min), jnp.asarray(self._spec_max)
        return (x + 1) / 2 * (hi - lo) + lo

    # ------------------------------------------------------------- q process
    def q_sample(self, x_start, t, noise):
        return (self._extract(self.sqrt_alphas_cumprod, t) * x_start
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t) * noise)

    # ------------------------------------------------------------- training
    def p_losses(self, params, x_start, t, cond, noise,
                 nonpadding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Epsilon-prediction loss (reference :213-231). x_start normalized [B,T,M]."""
        x_noisy = self.q_sample(x_start, t, noise)
        eps_hat = self.denoise_fn(params, x_noisy, t, cond)
        if self.cfg.loss_type == "l1":
            err = jnp.abs(noise - eps_hat)
            if nonpadding is not None:
                return (err * nonpadding[:, :, None]).mean()
            return err.mean()
        if self.cfg.loss_type == "l2":
            err = (noise - eps_hat) ** 2
            if nonpadding is not None:
                return (err * nonpadding[:, :, None]).mean()
            return err.mean()
        raise NotImplementedError(self.cfg.loss_type)

    def training_loss(self, params, ref_mels, t, cond, noise,
                      nonpadding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """norm_spec + p_losses (reference forward !infer branch :241-247)."""
        return self.p_losses(params, self.norm_spec(ref_mels), t, cond, noise,
                             nonpadding=nonpadding)

    # ------------------------------------------------------------- sampling
    def _predict_start(self, params, x, t, eps):
        return (self._extract(self.sqrt_recip_alphas_cumprod, t) * x
                - self._extract(self.sqrt_recipm1_alphas_cumprod, t) * eps)

    def p_sample_step(self, params, x, t, cond, noise, clip_denoised: bool = True):
        """One DDPM reverse step (reference :128-166)."""
        eps = self.denoise_fn(params, x, t, cond)
        x_recon = self._predict_start(params, x, t, eps)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (self._extract(self.posterior_mean_coef1, t) * x_recon
                + self._extract(self.posterior_mean_coef2, t) * x)
        log_var = self._extract(self.posterior_log_variance_clipped, t)
        nonzero = (t > 0).astype(x.dtype)[:, None, None]
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def _plms_get_x_pred(self, x, noise_t, t, interval: int):
        """Transfer x_t -> x_{t-interval} given an epsilon estimate
        (reference :173-184). a_prev == 1 when t < interval."""
        a = self.alphas_cumprod
        a_t = self._extract(a, t)
        a_prev = jnp.where((t < interval)[:, None, None],
                           jnp.ones_like(a_t),
                           self._extract(a, jnp.maximum(t - interval, 0)))
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        x_delta = (a_prev - a_t) * (
            (1 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
            - 1 / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t)
                             + jnp.sqrt((1 - a_t) * a_prev))) * noise_t)
        return x + x_delta

    def p_sample_plms_step(self, params, x, t, cond, noise_buf, step_idx,
                           interval: int):
        """One PLMS step with the Adams-Bashforth order ramp (reference :168-204).

        noise_buf: [3, B, T, M] ring of previous eps predictions (newest first);
        step_idx: scalar int32, 0 on the first step. Returns (x_prev, new_buf).
        """
        eps = self.denoise_fn(params, x, t, cond)

        def order1(_):
            x_pred = self._plms_get_x_pred(x, eps, t, interval)
            t_prev = jnp.maximum(t - interval, 0)
            eps_prev = self.denoise_fn(params, x_pred, t_prev, cond)
            return (eps + eps_prev) / 2

        def order2(_):
            return (3 * eps - noise_buf[0]) / 2

        def order3(_):
            return (23 * eps - 16 * noise_buf[0] + 5 * noise_buf[1]) / 12

        def order4(_):
            return (55 * eps - 59 * noise_buf[0] + 37 * noise_buf[1]
                    - 9 * noise_buf[2]) / 24

        order = jnp.minimum(step_idx, 3)
        eps_prime = jax.lax.switch(order, [order1, order2, order3, order4], None)
        x_prev = self._plms_get_x_pred(x, eps_prime, t, interval)
        new_buf = jnp.concatenate([eps[None], noise_buf[:2]], axis=0)
        return x_prev, new_buf

    def sample(self, params, cond: jnp.ndarray, rng: jax.Array,
               fs2_mel: Optional[jnp.ndarray] = None,
               tgt_nonpadding: Optional[jnp.ndarray] = None,
               cond_ctx=None) -> jnp.ndarray:
        """Full reverse diffusion as a single lax.scan (reference :248-275).

        cond: [B, T, H]; fs2_mel: [B, T, M] un-normalized boost mel (ignored when
        cfg.gaussian_start). ``cond_ctx`` optionally replaces what is forwarded
        to ``denoise_fn`` (e.g. precomputed per-layer conditioner projections —
        step-invariant, so hoisted out of the scan). Returns denormalized mel.
        """
        cfg = self.cfg
        b, t_mel, _ = cond.shape
        if cond_ctx is None:
            cond_ctx = cond
        shape = (b, t_mel, cfg.keep_bins)
        k = cfg.k_step
        rng, init_rng = jax.random.split(rng)
        if cfg.gaussian_start or fs2_mel is None:
            x = jax.random.normal(init_rng, shape)
        else:
            boost_noise = jax.random.normal(init_rng, shape)
            x = self.q_sample(self.norm_spec(fs2_mel),
                              jnp.full((b,), k - 1, jnp.int32), boost_noise)

        if cfg.pndm_speedup:
            interval = int(cfg.pndm_speedup)
            ts = np.arange(0, k, interval)[::-1].copy()

            # first step (Adams-Bashforth order-1 warmup) hoisted OUT of the
            # scan: it is the only step that evaluates the denoiser TWICE
            # (reference :186-190), and hoisting keeps the scan body a
            # single-eval program (same trajectory, steps 1.. use orders 2-4)
            t0 = jnp.full((b,), int(ts[0]), jnp.int32)
            eps0 = self.denoise_fn(params, x, t0, cond_ctx)
            x_pred = self._plms_get_x_pred(x, eps0, t0, interval)
            t_prev = jnp.maximum(t0 - interval, 0)
            eps_prev = self.denoise_fn(params, x_pred, t_prev, cond_ctx)
            x = self._plms_get_x_pred(x, (eps0 + eps_prev) / 2, t0, interval)
            buf = jnp.concatenate([eps0[None],
                                   jnp.zeros((2,) + shape)], axis=0)

            def plms_body(carry, t_scalar):
                x, buf, idx = carry
                t_vec = jnp.full((b,), t_scalar, jnp.int32)
                eps = self.denoise_fn(params, x, t_vec, cond_ctx)

                def order2(_):
                    return (3 * eps - buf[0]) / 2

                def order3(_):
                    return (23 * eps - 16 * buf[0] + 5 * buf[1]) / 12

                def order4(_):
                    return (55 * eps - 59 * buf[0] + 37 * buf[1]
                            - 9 * buf[2]) / 24

                eps_prime = jax.lax.switch(
                    jnp.clip(idx - 1, 0, 2), [order2, order3, order4], None)
                x = self._plms_get_x_pred(x, eps_prime, t_vec, interval)
                new_buf = jnp.concatenate([eps[None], buf[:2]], axis=0)
                return (x, new_buf, idx + 1), None

            if len(ts) > 1:
                (x, _, _), _ = jax.lax.scan(
                    plms_body, (x, buf, jnp.int32(1)), jnp.asarray(ts[1:]))
        else:
            step_rngs = jax.random.split(rng, k)

            def ddpm_body(x, inp):
                t_scalar, step_rng = inp
                t_vec = jnp.full((b,), t_scalar, jnp.int32)
                noise = jax.random.normal(step_rng, shape)
                return self.p_sample_step(params, x, t_vec, cond_ctx, noise), None

            x, _ = jax.lax.scan(ddpm_body, x, (jnp.arange(k - 1, -1, -1), step_rngs))

        x = self.denorm_spec(x)
        if tgt_nonpadding is not None:
            x = x * tgt_nonpadding[:, :, None]
        return x
