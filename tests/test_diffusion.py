"""Diffusion core: schedule buffers, oracle-denoiser reconstruction, and a
step-by-step PLMS parity check against a direct numpy restatement of the
reference algorithm (usr/diff/shallow_diffusion_tts.py:159-231)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.models.diffnet import DiffNet
from diffsinger_tpu.models.diffusion import (DiffusionConfig, GaussianDiffusion,
                                             cosine_beta_schedule,
                                             linear_beta_schedule)

B, T, M, H = 2, 16, 8, 12


def _mk_diffusion(denoise_fn, **kw):
    cfg = DiffusionConfig(timesteps=kw.pop("timesteps", 50),
                          k_step=kw.pop("k_step", 50), keep_bins=M,
                          spec_min=tuple([-4.0] * M), spec_max=tuple([0.5] * M),
                          schedule_type="linear", max_beta=0.06, **kw)
    return GaussianDiffusion(cfg, denoise_fn)


def test_schedules():
    lin = linear_beta_schedule(100, 0.06)
    assert lin[0] == 1e-4 and abs(lin[-1] - 0.06) < 1e-9
    cos = cosine_beta_schedule(100)
    assert (cos >= 0).all() and (cos <= 0.999).all()
    gd = _mk_diffusion(lambda p, x, t, c: x)
    np.testing.assert_allclose(gd.posterior_variance[1:],
                               gd.betas[1:] * (1 - gd.alphas_cumprod[:-1])
                               / (1 - gd.alphas_cumprod[1:]), rtol=1e-10)


def test_norm_denorm_spec_roundtrip(rng):
    gd = _mk_diffusion(lambda p, x, t, c: x)
    mel = rng.uniform(-4, 0.5, size=(B, T, M)).astype(np.float32)
    rt = np.asarray(gd.denorm_spec(gd.norm_spec(jnp.asarray(mel))))
    np.testing.assert_allclose(rt, mel, atol=1e-5)
    normed = np.asarray(gd.norm_spec(jnp.asarray(mel)))
    assert normed.min() >= -1.001 and normed.max() <= 1.001


def _oracle_denoiser(gd, x0):
    """Perfect epsilon oracle: eps = (x_t - sqrt(ac_t) x0) / sqrt(1-ac_t)."""
    sac = jnp.asarray(gd.sqrt_alphas_cumprod)
    s1m = jnp.asarray(gd.sqrt_one_minus_alphas_cumprod)

    def fn(params, x, t, cond):
        return (x - sac[t][:, None, None] * x0) / s1m[t][:, None, None]

    return fn


def test_ddpm_sampling_recovers_x0(rng):
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, size=(B, T, M)).astype(np.float32))
    gd = _mk_diffusion(None)
    gd.denoise_fn = _oracle_denoiser(gd, x0)
    cond = jnp.zeros((B, T, H))
    mel = gd.sample({}, cond, jax.random.PRNGKey(0),
                    fs2_mel=gd.denorm_spec(x0))
    got = np.asarray(gd.norm_spec(mel))
    assert np.abs(got - np.asarray(x0)).mean() < 0.15


def test_plms_sampling_recovers_x0(rng):
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, size=(B, T, M)).astype(np.float32))
    gd = _mk_diffusion(None, pndm_speedup=5, gaussian_start=True)
    gd.denoise_fn = _oracle_denoiser(gd, x0)
    cond = jnp.zeros((B, T, H))
    mel = gd.sample({}, cond, jax.random.PRNGKey(0))
    got = np.asarray(gd.norm_spec(mel))
    assert np.abs(got - np.asarray(x0)).mean() < 0.2


def _np_plms_reference(gd, x, ts, interval, denoise_np):
    """Direct numpy restatement of reference p_sample_plms (:168-204)."""
    noise_list = []

    def get_x_pred(x, noise_t, t):
        a_t = gd.alphas_cumprod[t]
        a_prev = 1.0 if t < interval else gd.alphas_cumprod[max(t - interval, 0)]
        a_t_sq, a_prev_sq = np.sqrt(a_t), np.sqrt(a_prev)
        x_delta = (a_prev - a_t) * ((1 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
                                    - 1 / (a_t_sq * (np.sqrt((1 - a_prev) * a_t)
                                                     + np.sqrt((1 - a_t) * a_prev)))
                                    * noise_t)
        return x + x_delta

    for t in ts:
        noise_pred = denoise_np(x, t)
        if len(noise_list) == 0:
            x_pred = get_x_pred(x, noise_pred, t)
            noise_pred_prev = denoise_np(x_pred, max(t - interval, 0))
            noise_prime = (noise_pred + noise_pred_prev) / 2
        elif len(noise_list) == 1:
            noise_prime = (3 * noise_pred - noise_list[-1]) / 2
        elif len(noise_list) == 2:
            noise_prime = (23 * noise_pred - 16 * noise_list[-1]
                           + 5 * noise_list[-2]) / 12
        else:
            noise_prime = (55 * noise_pred - 59 * noise_list[-1]
                           + 37 * noise_list[-2] - 9 * noise_list[-3]) / 24
        x = get_x_pred(x, noise_prime, t)
        noise_list.append(noise_pred)
    return x


def test_plms_matches_numpy_reference(rng):
    """Same deterministic linear 'denoiser' -> identical trajectories."""
    w = rng.randn(M, M).astype(np.float32) * 0.05

    def denoise_jax(params, x, t, cond):
        return jnp.einsum("btm,mn->btn", x, jnp.asarray(w))

    def denoise_np(x, t):
        return x @ w

    gd = _mk_diffusion(denoise_jax, timesteps=50, k_step=50, pndm_speedup=10,
                       gaussian_start=True)
    x_init = rng.randn(B, T, M).astype(np.float32)
    ts = list(range(0, 50, 10))[::-1]
    want = _np_plms_reference(gd, x_init.copy(), ts, 10, denoise_np)

    # drive the jax PLMS steps directly from the same x_init
    x = jnp.asarray(x_init)
    buf = jnp.zeros((3, B, T, M))
    for idx, t in enumerate(ts):
        t_vec = jnp.full((B,), t, jnp.int32)
        x, buf = gd.p_sample_plms_step({}, x, t_vec, None, buf, jnp.int32(idx), 10)
    # algorithmic parity is exact (verified 1e-14 in f64); the f32 schedule
    # coefficients vs the numpy-f64 reference leave ~2e-3 drift over 5 steps
    np.testing.assert_allclose(np.asarray(x), want, atol=6e-3)


def test_q_sample_statistics(rng):
    gd = _mk_diffusion(lambda p, x, t, c: x)
    x0 = jnp.ones((B, T, M))
    noise = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    t0 = jnp.zeros((B,), jnp.int32)
    xt = gd.q_sample(x0, t0, noise)
    # at t=0 alpha_cumprod ~ 1 - 1e-4: x_t ~ x0 + tiny noise
    assert np.abs(np.asarray(xt) - 1.0).mean() < 0.05


def test_diffnet_shapes_and_zero_init(rng):
    net = DiffNet(in_dims=M, encoder_hidden=H, residual_layers=3,
                  residual_channels=16, dilation_cycle_length=2)
    spec = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    t = jnp.array([3, 7])
    cond = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), spec, t, cond)
    out = net.apply(variables, spec, t, cond)
    assert out.shape == (B, T, M)
    # zero-init output projection -> zero output at init
    assert np.abs(np.asarray(out)).max() == 0.0


def test_training_loss_decreases_with_perfect_denoiser(rng):
    gd = _mk_diffusion(None)
    mel = jnp.asarray(rng.uniform(-4, 0.5, (B, T, M)).astype(np.float32))
    noise = jnp.asarray(rng.randn(B, T, M).astype(np.float32))
    t = jnp.array([10, 40])
    gd.denoise_fn = lambda p, x, tt, c: noise  # perfect eps prediction
    loss = gd.training_loss({}, mel, t, None, noise)
    assert float(loss) < 1e-6
    gd.denoise_fn = lambda p, x, tt, c: jnp.zeros_like(x)
    loss_bad = gd.training_loss({}, mel, t, None, noise)
    assert float(loss_bad) > 0.1
