"""Scheduler math vs closed form and an independent numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantir_tpu.schedulers import (
    add_noise,
    ddim_solver_timesteps,
    ddim_step,
    ddpm_inference_timesteps,
    ddpm_step,
    get_velocity,
    importance_sampling_weights,
    lcm_boundary_scalings,
    lcm_inference_timesteps,
    lcm_single_step,
    make_schedule,
    pred_eps_from_x0,
    pred_x0_from_eps,
    sdxl_schedule,
)
from instantir_tpu.schedulers.diffusion import ddpm_prev_timesteps


def np_alphas_cumprod():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    return np.cumprod(1 - betas)


def test_schedule_tables_match_closed_form():
    sched = sdxl_schedule()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), np_alphas_cumprod(), rtol=1e-6)
    assert sched.alphas_cumprod.dtype == jnp.float32
    assert float(sched.final_alpha_cumprod) == 1.0


def test_add_noise_batched_t(rng):
    sched = sdxl_schedule()
    x0 = jnp.asarray(rng.normal(size=(3, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(3, 4, 8, 8)), dtype=jnp.float32)
    t = jnp.asarray([0, 500, 999])
    xt = add_noise(sched, x0, eps, t)
    abar = np_alphas_cumprod()[np.array([0, 500, 999])]
    expected = np.sqrt(abar)[:, None, None, None] * np.asarray(x0) + np.sqrt(1 - abar)[:, None, None, None] * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5, atol=1e-6)


def test_x0_eps_roundtrip(rng):
    sched = sdxl_schedule()
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    t = jnp.asarray([100, 900])
    xt = add_noise(sched, x0, eps, t)
    np.testing.assert_allclose(np.asarray(pred_x0_from_eps(sched, xt, eps, t)), np.asarray(x0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_eps_from_x0(sched, xt, x0, t)), np.asarray(eps), rtol=1e-4, atol=1e-4)


def test_velocity_identity(rng):
    # v-parameterization identity: x0 = sa*x_t - sb*v
    sched = sdxl_schedule()
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    t = jnp.asarray([13, 700])
    xt = add_noise(sched, x0, eps, t)
    v = get_velocity(sched, x0, eps, t)
    abar = np_alphas_cumprod()[np.asarray(t)][:, None, None, None]
    rec = np.sqrt(abar) * np.asarray(xt) - np.sqrt(1 - abar) * np.asarray(v)
    np.testing.assert_allclose(rec, np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_lcm_boundary_scalings_closed_form():
    # c_skip = s^2/( (10t)^2 + s^2 ), c_out = 10t/sqrt((10t)^2+s^2), s=0.5
    t = jnp.asarray([0, 250, 999])
    c_skip, c_out = lcm_boundary_scalings(t)
    st = np.asarray(t) * 10.0
    np.testing.assert_allclose(np.asarray(c_skip), 0.25 / (st**2 + 0.25), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), st / np.sqrt(st**2 + 0.25), rtol=1e-6)
    # at t=0 the consistency function is the identity: c_skip=1, c_out=0
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == 0.0


def test_lcm_single_step_perfect_model_recovers_x0(rng):
    # With the true eps as model output, pred_x0 == x0, so
    # denoised = c_out*x0 + c_skip*x_t exactly.
    sched = sdxl_schedule()
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 4)), dtype=jnp.float32)
    t = jnp.asarray([999, 500])
    xt = add_noise(sched, x0, eps, t)
    denoised = lcm_single_step(sched, eps, t, xt)
    c_skip, c_out = lcm_boundary_scalings(t)
    expected = np.asarray(c_out)[:, None, None, None] * np.asarray(x0) + np.asarray(c_skip)[:, None, None, None] * np.asarray(xt)
    np.testing.assert_allclose(np.asarray(denoised), expected, rtol=1e-4, atol=1e-4)


def test_ddpm_step_perfect_model_converges(rng):
    # Running the full 30-step DDPM chain with the oracle eps should land
    # close to x0 (deterministic part dominates near t=0).
    sched = sdxl_schedule()
    ts = ddpm_inference_timesteps(30)
    prev_ts = ddpm_prev_timesteps(ts, 1000, 30)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    eps0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), dtype=jnp.float32)
    x = add_noise(sched, x0, eps0, jnp.asarray([int(ts[0])]))
    key = jax.random.PRNGKey(0)
    for t, pt in zip(ts, prev_ts):
        key, sub = jax.random.split(key)
        eps_true = pred_eps_from_x0(sched, x, x0, jnp.asarray([int(t)]))
        noise = jax.random.normal(sub, x.shape)
        x, pred = ddpm_step(sched, eps_true, jnp.asarray([int(t)]), jnp.asarray([int(pt)]), x, noise)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(x0), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=0.15, atol=0.15)


def test_ddpm_step_oracle_single_step(rng):
    # Independent numpy oracle for one step (fixed_small variance, eps pred).
    sched = sdxl_schedule()
    abar = np_alphas_cumprod()
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    noise = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    t, pt = 467, 434
    a_t, a_p = abar[t], abar[pt]
    cur_beta = 1 - a_t / a_p
    x0_hat = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    mu = (np.sqrt(a_p) * cur_beta / (1 - a_t)) * x0_hat + (np.sqrt(a_t / a_p) * (1 - a_p) / (1 - a_t)) * x
    var = (1 - a_p) / (1 - a_t) * cur_beta
    expected = mu + np.sqrt(var) * noise
    got, got_x0 = ddpm_step(
        sched, jnp.asarray(eps), jnp.asarray([t]), jnp.asarray([pt]), jnp.asarray(x), jnp.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x0), x0_hat, rtol=1e-4, atol=1e-5)


def test_ddim_step_deterministic_consistency(rng):
    # DDIM with oracle eps is exact: stepping t→prev then re-noising x0 at
    # prev_t with the oracle eps reproduces prev_sample.
    sched = sdxl_schedule()
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), dtype=jnp.float32)
    t, pt = jnp.asarray([799]), jnp.asarray([779])
    xt = add_noise(sched, x0, eps, t)
    prev, pred = ddim_step(sched, eps, t, pt, xt)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(x0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(add_noise(sched, x0, eps, pt)), rtol=1e-4, atol=1e-4)


def test_timestep_sequences():
    ts = ddpm_inference_timesteps(30, timestep_spacing="leading", steps_offset=1)
    assert len(ts) == 30 and ts[0] == 29 * 33 + 1 and ts[-1] == 1
    assert np.all(np.diff(ts) == -33)

    lcm = lcm_inference_timesteps(4, original_inference_steps=50)
    # c=20; origin = [19, 39, ..., 999]; skipping=12 → [999, 759, 519, 279]
    np.testing.assert_array_equal(lcm, [999, 759, 519, 279])

    solver = ddim_solver_timesteps(1000, 50)
    assert solver[0] == 19 and solver[-1] == 999 and len(solver) == 50

    w = importance_sampling_weights(1000)
    assert w.shape == (1000,) and abs(w.sum() - 1.0) < 1e-6
    assert w[999] > w[0]  # late timesteps upweighted


def test_scan_compatibility():
    # The whole chain must trace inside lax.scan with batched t as carry-free
    # per-step inputs (this is the sampler's core invariant).
    sched = sdxl_schedule()
    ts = ddpm_inference_timesteps(10)
    prev_ts = ddpm_prev_timesteps(ts, 1000, 10)
    seq = jnp.stack([jnp.asarray(ts, dtype=jnp.int32), jnp.asarray(prev_ts, dtype=jnp.int32)], axis=1)

    def body(x, t_pair):
        t = jnp.broadcast_to(t_pair[0], (x.shape[0],))
        pt = jnp.broadcast_to(t_pair[1], (x.shape[0],))
        eps = x * 0.1  # stand-in model
        x, _ = ddpm_step(sched, eps, t, pt, x, jnp.zeros_like(x))
        return x, ()

    x = jnp.ones((2, 4, 4, 4), dtype=jnp.float32)
    out, _ = jax.jit(lambda x: jax.lax.scan(body, x, seq))(x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
