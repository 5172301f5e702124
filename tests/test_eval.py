"""TTO (latent-code + pose recovery) and full-image rendering."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.core.geometry import pixel_directions, pose_spherical
from codenerf_tpu.eval import init_tto_state, make_tto_step, make_image_renderer
from codenerf_tpu.eval.tto import (init_batched_tto_state,
                                   make_batched_tto_step, select_per_object)
from codenerf_tpu.models import init_code_tables
from codenerf_tpu.parallel import make_mesh
from codenerf_tpu.pipeline import RenderSettings, init_model
from codenerf_tpu.train import init_train_state
from tests.test_train import tiny_config


def _setup(model_type="CodeNeRFModel"):
    cfg = tiny_config(model_type)
    settings = RenderSettings.from_config(cfg)
    state, _ = init_train_state(jax.random.PRNGKey(0), cfg, settings,
                                num_objects=3)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 10.0
    K[0, 2] = K[1, 2] = 4.0
    dirs = pixel_directions(8, 8, jnp.asarray(K))
    return cfg, settings, state, dirs


class TestTTO:
    def test_init_state_matches_reference_semantics(self):
        cfg, settings, state, dirs = _setup()
        tto, _ = init_tto_state(state.params["codes"], cfg.optimizer)
        # codes = table means (eval.py:126-127)
        np.testing.assert_allclose(
            np.asarray(tto.variables["z_s"]),
            np.asarray(state.params["codes"]["shape"]).mean(0, keepdims=True),
            rtol=1e-6)
        # pose init (eval.py:129-131)
        assert float(tto.variables["theta"][0]) == pytest.approx(1.57)
        assert float(tto.variables["phi"][0]) == pytest.approx(0.0)
        assert float(tto.variables["rho"][0]) == pytest.approx(1.30)

    def test_tto_optimizes_codes_and_pose(self):
        cfg, settings, state, dirs = _setup()
        tto, optimizer = init_tto_state(state.params["codes"], cfg.optimizer)
        step = make_tto_step(settings, optimizer, num_random_rays=32,
                             regularizer_lambda=1e-5, perturb=True)

        pose_gt = pose_spherical(1.8, 0.3, 1.5)
        target = jnp.full((8, 8, 3), 0.4)
        key = jax.random.PRNGKey(1)
        theta0 = float(tto.variables["theta"][0])
        losses, perrs = [], []
        for i in range(20):
            key, k = jax.random.split(key)
            tto, m = step(tto, state.params, dirs, target, pose_gt, k)
            losses.append(float(m.loss))
            perrs.append(float(m.pose_error))
        # all variable groups moved
        assert float(tto.variables["theta"][0]) != theta0
        assert losses[-1] < losses[0]
        assert np.isfinite(perrs).all()
        # model weights were never touched
        assert int(tto.step) == 20


class TestBatchedTTO:
    """Batched multi-object TTO (beyond-reference, eval/tto.py)."""

    def test_k1_matches_unbatched(self):
        """K=1 batched step reproduces the single-object step exactly
        (same PRNG call structure by construction)."""
        cfg, settings, state, dirs = _setup()
        pose_gt = pose_spherical(1.8, 0.3, 1.5)
        target = jnp.full((8, 8, 3), 0.4)

        tto_u, opt_u = init_tto_state(state.params["codes"], cfg.optimizer)
        step_u = make_tto_step(settings, opt_u, num_random_rays=32,
                               regularizer_lambda=1e-5, perturb=True)
        tto_b, opt_b = init_batched_tto_state(state.params["codes"],
                                              cfg.optimizer, 1)
        step_b = make_batched_tto_step(settings, opt_b, num_random_rays=32,
                                       regularizer_lambda=1e-5, perturb=True)

        key = jax.random.PRNGKey(7)
        for _ in range(3):
            key, k = jax.random.split(key)
            tto_u, m_u = step_u(tto_u, state.params, dirs, target, pose_gt, k)
            tto_b, m_b = step_b(tto_b, state.params, dirs, target[None],
                                pose_gt[None], k)
        np.testing.assert_allclose(np.asarray(tto_b.variables["z_s"][0]),
                                   np.asarray(tto_u.variables["z_s"][0]),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(
            float(tto_b.variables["theta"][0]),
            float(tto_u.variables["theta"][0]), rtol=1e-5)
        np.testing.assert_allclose(float(m_b.loss[0]),
                                   float(m_u.loss), rtol=1e-5)
        np.testing.assert_allclose(float(m_b.pose_error[0]),
                                   float(m_u.pose_error), rtol=1e-5)

    def test_objects_are_independent(self):
        """Changing object 1's target must not change object 0's update."""
        cfg, settings, state, dirs = _setup()
        poses_gt = jnp.stack([pose_spherical(1.8, 0.3, 1.5),
                              pose_spherical(1.5, -0.4, 1.2)])
        t0 = jnp.full((8, 8, 3), 0.4)
        tA = jnp.stack([t0, jnp.full((8, 8, 3), 0.7)])
        tB = jnp.stack([t0, jnp.full((8, 8, 3), 0.1)])

        key = jax.random.PRNGKey(3)
        outs = []
        for targets in (tA, tB):
            tto, opt = init_batched_tto_state(state.params["codes"],
                                              cfg.optimizer, 2)
            step = make_batched_tto_step(settings, opt, num_random_rays=32,
                                         regularizer_lambda=1e-5,
                                         perturb=True)
            s, m = step(tto, state.params, dirs, targets, poses_gt, key)
            outs.append((s, m))
        (sA, mA), (sB, mB) = outs
        # object 0: identical update and loss
        np.testing.assert_allclose(np.asarray(sA.variables["z_s"][0]),
                                   np.asarray(sB.variables["z_s"][0]),
                                   rtol=1e-6, atol=0)
        np.testing.assert_allclose(float(mA.loss[0]), float(mB.loss[0]),
                                   rtol=1e-6)
        # object 1: different targets -> different losses
        assert abs(float(mA.loss[1]) - float(mB.loss[1])) > 1e-4

    def test_batched_tto_optimizes_all_objects(self):
        cfg, settings, state, dirs = _setup()
        K = 3
        poses_gt = jnp.stack([pose_spherical(1.8, 0.3, 1.5)] * K)
        targets = jnp.stack([jnp.full((8, 8, 3), 0.2 + 0.25 * i)
                             for i in range(K)])
        tto, opt = init_batched_tto_state(state.params["codes"],
                                          cfg.optimizer, K)
        step = make_batched_tto_step(settings, opt, num_random_rays=32,
                                     regularizer_lambda=1e-5, perturb=True)
        key = jax.random.PRNGKey(5)
        first = None
        for _ in range(20):
            key, k = jax.random.split(key)
            tto, m = step(tto, state.params, dirs, targets, poses_gt, k)
            if first is None:
                first = np.asarray(m.loss)
        last = np.asarray(m.loss)
        assert (last < first).all(), (first, last)
        assert np.isfinite(np.asarray(m.pose_error)).all()

    def test_meshed_batched_step_matches_single_device(self):
        """Sharding the K*R ray axis over the mesh must not change the
        update (the DP-2 invariant, extended to batched TTO)."""
        cfg, settings, state, dirs = _setup()
        K = 2
        poses_gt = jnp.stack([pose_spherical(1.8, 0.3, 1.5),
                              pose_spherical(1.5, -0.4, 1.2)])
        targets = jnp.stack([jnp.full((8, 8, 3), 0.4),
                             jnp.full((8, 8, 3), 0.7)])
        key = jax.random.PRNGKey(11)
        results = []
        for mesh in (None, make_mesh()):
            tto, opt = init_batched_tto_state(state.params["codes"],
                                              cfg.optimizer, K)
            step = make_batched_tto_step(settings, opt, num_random_rays=32,
                                         regularizer_lambda=1e-5,
                                         perturb=True, mesh=mesh)
            s, m = step(tto, state.params, dirs, targets, poses_gt, key)
            results.append((s, m))
        (s1, m1), (s2, m2) = results
        np.testing.assert_allclose(np.asarray(m1.loss), np.asarray(m2.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1.variables["z_s"]),
                                   np.asarray(s2.variables["z_s"]),
                                   rtol=1e-4, atol=1e-7)

    def test_select_per_object_merges_statewise(self):
        cfg, settings, state, dirs = _setup()
        a, _ = init_batched_tto_state(state.params["codes"], cfg.optimizer, 2,
                                      pose_init=(1.0, 0.5, 1.1))
        b, _ = init_batched_tto_state(state.params["codes"], cfg.optimizer, 2,
                                      pose_init=(2.0, -0.5, 1.9))
        merged = select_per_object(jnp.asarray([True, False]), a, b)
        assert float(merged.variables["theta"][0]) == pytest.approx(1.0)
        assert float(merged.variables["theta"][1]) == pytest.approx(2.0)
        assert float(merged.variables["phi"][0]) == pytest.approx(0.5)
        assert float(merged.variables["phi"][1]) == pytest.approx(-0.5)
        # z codes identical in both inits -> unchanged by the merge
        np.testing.assert_allclose(np.asarray(merged.variables["z_s"]),
                                   np.asarray(a.variables["z_s"]))


class TestMultiviewTTO:
    """Multi-view TTO (beyond-reference, VERDICT round-3 item 2b): V views
    of each object share one code vector, per-view spherical cameras."""

    def test_v1_matches_batched(self):
        """V=1 multi-view step reproduces the batched step (same PRNG call
        structure and loss by construction)."""
        from codenerf_tpu.eval.tto import (init_multiview_tto_state,
                                           make_multiview_tto_step)
        cfg, settings, state, dirs = _setup()
        K = 2
        poses_gt = jnp.stack([pose_spherical(1.8, 0.3, 1.5),
                              pose_spherical(1.5, -0.4, 1.2)])
        targets = jnp.stack([jnp.full((8, 8, 3), 0.4),
                             jnp.full((8, 8, 3), 0.7)])

        tto_b, opt_b = init_batched_tto_state(state.params["codes"],
                                              cfg.optimizer, K)
        step_b = make_batched_tto_step(settings, opt_b, num_random_rays=32,
                                       regularizer_lambda=1e-5, perturb=True)
        tto_m, opt_m = init_multiview_tto_state(state.params["codes"],
                                                cfg.optimizer, K, 1)
        step_m = make_multiview_tto_step(settings, opt_m, num_random_rays=32,
                                         regularizer_lambda=1e-5,
                                         perturb=True)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            key, k = jax.random.split(key)
            tto_b, m_b = step_b(tto_b, state.params, dirs, targets,
                                poses_gt, k)
            tto_m, m_m = step_m(tto_m, state.params, dirs, targets[:, None],
                                poses_gt[:, None], k)
        np.testing.assert_allclose(np.asarray(tto_m.variables["z_s"]),
                                   np.asarray(tto_b.variables["z_s"]),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(tto_m.variables["theta"][:, 0]),
                                   np.asarray(tto_b.variables["theta"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m_m.loss), np.asarray(m_b.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m_m.pose_error),
                                   np.asarray(m_b.pose_error), rtol=1e-5)

    def test_multiview_optimizes_shared_codes_per_view_poses(self):
        from codenerf_tpu.eval.tto import (init_multiview_tto_state,
                                           make_multiview_tto_step)
        cfg, settings, state, dirs = _setup()
        K, V = 2, 3
        poses_gt = jnp.stack([
            jnp.stack([pose_spherical(1.4 + 0.2 * v, 0.5 * v, 1.3)
                       for v in range(V)]) for _ in range(K)])
        targets = jnp.stack([
            jnp.stack([jnp.full((8, 8, 3), 0.2 + 0.2 * v)
                       for v in range(V)]) for _ in range(K)])

        tto, opt = init_multiview_tto_state(state.params["codes"],
                                            cfg.optimizer, K, V)
        assert tto.variables["z_s"].shape[0] == K      # codes per OBJECT
        assert tto.variables["theta"].shape == (K, V)  # pose per VIEW
        step = make_multiview_tto_step(settings, opt, num_random_rays=32,
                                       regularizer_lambda=1e-5, perturb=True)
        key = jax.random.PRNGKey(5)
        losses = []
        for _ in range(15):
            key, k = jax.random.split(key)
            tto, m = step(tto, state.params, dirs, targets, poses_gt, k)
            losses.append(float(jnp.sum(m.loss)))
        assert losses[-1] < losses[0]
        # per-view cameras moved INDEPENDENTLY (different targets/views)
        th = np.asarray(tto.variables["theta"])
        assert np.ptp(th[0]) > 1e-5
        assert np.all(np.isfinite(np.asarray(m.pose_error)))

    def test_objects_independent_under_multiview(self):
        """Changing object 1's views must not change object 0's update."""
        from codenerf_tpu.eval.tto import (init_multiview_tto_state,
                                           make_multiview_tto_step)
        cfg, settings, state, dirs = _setup()
        K, V = 2, 2
        poses_gt = jnp.stack([
            jnp.stack([pose_spherical(1.8, 0.3, 1.5),
                       pose_spherical(1.6, 0.8, 1.4)]) for _ in range(K)])
        base = jnp.stack([jnp.full((8, 8, 3), 0.4),
                          jnp.full((8, 8, 3), 0.5)])
        tA = jnp.stack([base, jnp.full((2, 8, 8, 3), 0.7)])
        tB = jnp.stack([base, jnp.full((2, 8, 8, 3), 0.1)])

        key = jax.random.PRNGKey(3)
        outs = []
        for targets in (tA, tB):
            tto, opt = init_multiview_tto_state(state.params["codes"],
                                                cfg.optimizer, K, V)
            step = make_multiview_tto_step(settings, opt, num_random_rays=32,
                                           regularizer_lambda=1e-5,
                                           perturb=True)
            s, m = step(tto, state.params, dirs, targets, poses_gt, key)
            outs.append((s, m))
        (sA, mA), (sB, mB) = outs
        np.testing.assert_allclose(np.asarray(sA.variables["z_s"][0]),
                                   np.asarray(sB.variables["z_s"][0]),
                                   rtol=1e-6, atol=0)
        np.testing.assert_allclose(float(mA.loss[0]), float(mB.loss[0]),
                                   rtol=1e-6)
        assert abs(float(mA.loss[1]) - float(mB.loss[1])) > 1e-4


class TestImageRenderer:
    def test_render_shapes_and_finite(self):
        cfg, settings, state, dirs = _setup()
        render = make_image_renderer(settings, 8, 8, chunksize=16)
        z_s = jnp.zeros((1, 16))
        z_t = jnp.zeros((1, 16))
        pose = pose_spherical(1.57, 0.0, 1.3)
        rgb = render({"coarse": state.params["coarse"],
                      "fine": state.params["fine"]}, dirs, pose, z_s, z_t)
        assert rgb.shape == (64, 3)
        assert np.isfinite(np.asarray(rgb)).all()

    def test_chunking_invariant(self):
        """Chunk size must not change the rendered image."""
        cfg, settings, state, dirs = _setup()
        params = {"coarse": state.params["coarse"],
                  "fine": state.params["fine"]}
        z = jnp.zeros((1, 16))
        pose = pose_spherical(1.6, 0.1, 1.4)
        r1 = make_image_renderer(settings, 8, 8, chunksize=16)(
            params, dirs, pose, z, z)
        r2 = make_image_renderer(settings, 8, 8, chunksize=64)(
            params, dirs, pose, z, z)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   rtol=1e-5, atol=1e-6)

    def test_meshed_render_matches_single(self):
        cfg, settings, state, dirs = _setup()
        params = {"coarse": state.params["coarse"],
                  "fine": state.params["fine"]}
        z = jnp.zeros((1, 16))
        pose = pose_spherical(1.6, 0.1, 1.4)
        mesh = make_mesh()
        r1 = make_image_renderer(settings, 8, 8, chunksize=64)(
            params, dirs, pose, z, z)
        r2 = make_image_renderer(settings, 8, 8, chunksize=64, mesh=mesh)(
            params, dirs, pose, z, z)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   rtol=1e-5, atol=1e-6)

    def test_split_fc_out_matches_fused(self):
        """The serving-only split-fc_out layout lever must not change the
        rendered values (each output column accumulates identically)."""
        import dataclasses as dc
        from codenerf_tpu.eval.render import serving_settings
        from codenerf_tpu.pipeline import render_rays
        cfg, settings, state, dirs = _setup()
        params = {"coarse": state.params["coarse"],
                  "fine": state.params["fine"]}
        rng = np.random.default_rng(2)
        ro = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        rd = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(16, 16)) * 0.1, jnp.float32)
        # pin the reference column order explicitly (fc_out_tail_sigma
        # defaults on): reference-order fused vs serving split
        base = dc.replace(
            settings,
            coarse_cfg=dc.replace(settings.coarse_cfg, split_fc_out=False,
                                  fc_out_tail_sigma=False),
            fine_cfg=dc.replace(settings.fine_cfg, split_fc_out=False,
                                fc_out_tail_sigma=False))
        split = serving_settings(base)
        assert split.fine_cfg.split_fc_out and not base.fine_cfg.split_fc_out
        _, f1 = render_rays(params, base, ro, rd, z, z, None, False)
        _, f2 = render_rays(params, split, ro, rd, z, z, None, False)
        np.testing.assert_allclose(np.asarray(f1.rgb), np.asarray(f2.rgb),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f1.weights),
                                   np.asarray(f2.weights),
                                   rtol=1e-5, atol=1e-6)

    def test_split_fc_out_matches_fused_gradients(self):
        """runtime.split_fc_out also exists as a TRAINING lever (layout
        choice at flagship shapes): loss and parameter gradients must
        match the fused form."""
        import dataclasses as dc
        from codenerf_tpu.pipeline import render_rays
        cfg, settings, state, dirs = _setup()
        params = {"coarse": state.params["coarse"],
                  "fine": state.params["fine"]}
        rng = np.random.default_rng(3)
        ro = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        rd = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(16, 16)) * 0.1, jnp.float32)
        target = jnp.asarray(rng.uniform(size=(16, 3)), jnp.float32)
        # baseline = the reference column order (both layout flags off);
        # RuntimeConfig now defaults fc_out_tail_sigma=True, so build it
        # explicitly — otherwise the tail leg compares the path to itself
        def flags(s, **kw):
            return dc.replace(s, coarse_cfg=dc.replace(s.coarse_cfg, **kw),
                              fine_cfg=dc.replace(s.fine_cfg, **kw))

        base = flags(settings, split_fc_out=False, fc_out_tail_sigma=False)
        split = flags(base, split_fc_out=True)
        tail = flags(base, fc_out_tail_sigma=True)

        def loss(p, s):
            out_c, out_f = render_rays(p, s, ro, rd, z, z, None, False)
            return (jnp.mean((out_c.rgb - target) ** 2)
                    + jnp.mean((out_f.rgb - target) ** 2))

        l1, g1 = jax.value_and_grad(loss)(params, base)
        for variant in (split, tail):
            l2, g2 = jax.value_and_grad(loss)(params, variant)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
                g1, g2)

    def test_vanilla_render_without_codes(self):
        cfg, settings, state, dirs = _setup("FlexibleNeRFModel")
        render = make_image_renderer(settings, 8, 8, chunksize=32)
        rgb = render({"coarse": state.params["coarse"],
                      "fine": state.params["fine"]}, dirs,
                     pose_spherical(1.57, 0.0, 1.3), None, None)
        assert rgb.shape == (64, 3)
        assert np.isfinite(np.asarray(rgb)).all()


class TestSE3Refine:
    """SE(3)-tangent pose refinement after spherical TTO (beyond-reference,
    round-2): recovers off-sphere / rolled cameras the spherical (theta,
    phi, rho) parametrization cannot express."""

    def _offsphere_setup(self):
        from codenerf_tpu.core import lie
        cfg, settings, state, dirs = _setup()
        # well-conditioned toy scene: tie coarse = fine (so the coarse loss
        # term's pose minimum coincides with the fine one) and sharpen the
        # first layer so the rendered image carries spatial pose signal
        params = dict(state.params)
        fine = dict(state.params["fine"])
        fine["layer_xyz1"] = {"w": fine["layer_xyz1"]["w"] * 4.0,
                              "b": fine["layer_xyz1"]["b"]}
        params["coarse"] = params["fine"] = fine
        # GT camera: spherical pose perturbed by a rigid 6-DOF delta
        # (rotation incl. roll + off-sphere translation)
        base_gt = pose_spherical(1.6, 0.1, 1.3)
        xi_gt = jnp.asarray([0.04, -0.03, 0.05, 0.06, -0.05, 0.04])
        pose_gt = lie.se3_exp(xi_gt) @ base_gt
        # target rendered by the model itself at known codes + GT pose:
        # the refine loss has its minimum at the exact GT pose
        z_s = params["codes"]["shape"][:1]
        z_t = params["codes"]["texture"][:1]
        render = make_image_renderer(settings, 8, 8, chunksize=64)
        rgb = render({"coarse": params["coarse"],
                      "fine": params["fine"]}, dirs, pose_gt, z_s, z_t)
        target = rgb.reshape(8, 8, 3)
        return cfg, settings, params, dirs, pose_gt, target, (z_s, z_t)

    def test_xi_zero_reproduces_spherical_pose(self):
        from codenerf_tpu.eval.tto import (init_se3_refine_state,
                                           se3_refined_poses)
        cfg, settings, state, dirs = _setup()
        tto, _ = init_batched_tto_state(state.params["codes"], cfg.optimizer,
                                        num_objects=3)
        ref, _, base = init_se3_refine_state(tto, cfg.optimizer)
        np.testing.assert_allclose(np.asarray(ref.variables["xi"]), 0.0)
        poses = se3_refined_poses(ref.variables, base)
        np.testing.assert_allclose(np.asarray(poses), np.asarray(base),
                                   atol=1e-6)
        # codes carry over from the spherical stage
        np.testing.assert_allclose(np.asarray(ref.variables["z_s"]),
                                   np.asarray(tto.variables["z_s"]))

    def test_refine_recovers_offsphere_pose(self):
        """Starting from the closest spherical pose, the SE3 stage must cut
        the pose error (the spherical stage is structurally stuck there)."""
        from codenerf_tpu.core import lie
        from codenerf_tpu.eval.tto import (TTOState, init_se3_refine_state,
                                           make_se3_refine_step,
                                           se3_refined_poses)
        (cfg, settings, params, dirs, pose_gt, target,
         (z_s, z_t)) = self._offsphere_setup()

        # spherical stage result = the generating spherical parameters
        # (the best any spherical optimizer could do is this neighborhood)
        tto = TTOState({"z_s": z_s, "z_t": z_t,
                        "theta": jnp.asarray([1.6]),
                        "phi": jnp.asarray([0.1]),
                        "rho": jnp.asarray([1.3])}, None,
                       jnp.zeros((), jnp.int32))
        from dataclasses import replace
        opt_cfg = replace(cfg.optimizer, se3_refine_lr=2e-3, val_lr=1e-4)
        ref, opt, base = init_se3_refine_state(tto, opt_cfg)
        err0 = float(lie.pose_error(pose_gt, base[0]))
        assert err0 > 0.05  # the spherical pose is genuinely off

        step = make_se3_refine_step(settings, opt, num_random_rays=64,
                                    regularizer_lambda=0.0, perturb=False)
        key = jax.random.PRNGKey(3)
        for i in range(200):
            key, k = jax.random.split(key)
            ref, m = step(ref, params, dirs, target[None], base,
                          pose_gt[None], k)
        err1 = float(lie.pose_error(
            pose_gt, se3_refined_poses(ref.variables, base)[0]))
        assert np.isfinite(float(m.loss[0]))
        assert err1 < 0.6 * err0, (err0, err1)

    def test_refine_step_reduces_loss(self):
        from codenerf_tpu.eval.tto import (init_se3_refine_state,
                                           make_se3_refine_step)
        cfg, settings, state, dirs = _setup()
        tto, _ = init_batched_tto_state(state.params["codes"], cfg.optimizer,
                                        num_objects=2)
        ref, opt, base = init_se3_refine_state(tto, cfg.optimizer)
        step = make_se3_refine_step(settings, opt, num_random_rays=32,
                                    regularizer_lambda=1e-5, perturb=True)
        targets = jnp.stack([jnp.full((8, 8, 3), 0.3),
                             jnp.full((8, 8, 3), 0.7)])
        poses_gt = jnp.stack([base[0], base[1]])
        key = jax.random.PRNGKey(5)
        losses = []
        for i in range(15):
            key, k = jax.random.split(key)
            ref, m = step(ref, state.params, dirs, targets, base,
                          poses_gt, k)
            losses.append(np.asarray(m.loss))
        assert np.mean(losses[-3:], axis=0)[0] < losses[0][0]
        assert np.mean(losses[-3:], axis=0)[1] < losses[0][1]


class TestMultiviewSE3Refine:
    """SE(3) refinement composed with multi-view TTO (VERDICT round-4
    item 5): per-view xi [K, V, 6] on top of per-view spherical results,
    codes still shared per object."""

    def _mv_tto(self, state, cfg, K, V):
        from codenerf_tpu.eval.tto import init_multiview_tto_state
        tto, _ = init_multiview_tto_state(state.params["codes"],
                                          cfg.optimizer, K, V)
        # spread the per-view spherical results so base poses differ
        v = dict(tto.variables)
        v["theta"] = v["theta"] + 0.1 * jnp.arange(V)[None, :]
        v["phi"] = v["phi"] + 0.3 * jnp.arange(V)[None, :]
        return tto._replace(variables=v)

    def test_xi_zero_reproduces_per_view_spherical_poses(self):
        from codenerf_tpu.eval.tto import (init_multiview_se3_refine_state,
                                           multiview_se3_refined_poses)
        cfg, settings, state, dirs = _setup()
        K, V = 2, 3
        tto = self._mv_tto(state, cfg, K, V)
        ref, _, base = init_multiview_se3_refine_state(tto, cfg.optimizer)
        assert ref.variables["xi"].shape == (K, V, 6)
        assert base.shape == (K, V, 4, 4)
        np.testing.assert_allclose(np.asarray(ref.variables["xi"]), 0.0)
        poses = multiview_se3_refined_poses(ref.variables, base)
        np.testing.assert_allclose(np.asarray(poses), np.asarray(base),
                                   atol=1e-6)
        # base poses match each view's spherical camera
        expect = jax.vmap(jax.vmap(pose_spherical))(
            tto.variables["theta"], tto.variables["phi"],
            tto.variables["rho"])
        np.testing.assert_allclose(np.asarray(base), np.asarray(expect),
                                   atol=1e-6)
        # codes carry over shared per object
        assert ref.variables["z_s"].shape[0] == K
        np.testing.assert_allclose(np.asarray(ref.variables["z_s"]),
                                   np.asarray(tto.variables["z_s"]))

    def test_v1_matches_single_view_refine(self):
        """V=1 multi-view refine reproduces the single-view refine step
        (same PRNG call structure; K*V == K index draws)."""
        from codenerf_tpu.eval.tto import (
            init_se3_refine_state, init_multiview_se3_refine_state,
            make_se3_refine_step, make_multiview_se3_refine_step,
            init_multiview_tto_state)
        cfg, settings, state, dirs = _setup()
        K = 2
        tto_b, _ = init_batched_tto_state(state.params["codes"],
                                          cfg.optimizer, K)
        tto_m, _ = init_multiview_tto_state(state.params["codes"],
                                            cfg.optimizer, K, 1)
        ref_b, opt_b, base_b = init_se3_refine_state(tto_b, cfg.optimizer)
        ref_m, opt_m, base_m = init_multiview_se3_refine_state(
            tto_m, cfg.optimizer)
        step_b = make_se3_refine_step(settings, opt_b, num_random_rays=32,
                                      regularizer_lambda=1e-5, perturb=True)
        step_m = make_multiview_se3_refine_step(
            settings, opt_m, num_random_rays=32,
            regularizer_lambda=1e-5, perturb=True)
        targets = jnp.stack([jnp.full((8, 8, 3), 0.4),
                             jnp.full((8, 8, 3), 0.7)])
        poses_gt = jnp.stack([pose_spherical(1.8, 0.3, 1.5),
                              pose_spherical(1.5, -0.4, 1.2)])
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            key, k = jax.random.split(key)
            ref_b, m_b = step_b(ref_b, state.params, dirs, targets,
                                base_b, poses_gt, k)
            ref_m, m_m = step_m(ref_m, state.params, dirs, targets[:, None],
                                base_m, poses_gt[:, None], k)
        np.testing.assert_allclose(np.asarray(ref_m.variables["z_s"]),
                                   np.asarray(ref_b.variables["z_s"]),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ref_m.variables["xi"][:, 0]),
                                   np.asarray(ref_b.variables["xi"]),
                                   rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m_m.loss), np.asarray(m_b.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m_m.pose_error),
                                   np.asarray(m_b.pose_error), rtol=1e-5)

    def test_per_view_xi_moves_independently(self):
        """Each view's tangent correction optimizes against its own target:
        distinct per-view targets must drive distinct xi updates while the
        shared codes get one joint update."""
        from codenerf_tpu.eval.tto import (init_multiview_se3_refine_state,
                                           make_multiview_se3_refine_step)
        cfg, settings, state, dirs = _setup()
        K, V = 2, 3
        tto = self._mv_tto(state, cfg, K, V)
        ref, opt, base = init_multiview_se3_refine_state(tto, cfg.optimizer)
        step = make_multiview_se3_refine_step(
            settings, opt, num_random_rays=32,
            regularizer_lambda=1e-5, perturb=True)
        targets = jnp.stack([
            jnp.stack([jnp.full((8, 8, 3), 0.2 + 0.3 * v)
                       for v in range(V)]) for _ in range(K)])
        poses_gt = base
        key = jax.random.PRNGKey(5)
        losses = []
        for _ in range(15):
            key, k = jax.random.split(key)
            ref, m = step(ref, state.params, dirs, targets, base,
                          poses_gt, k)
            losses.append(float(jnp.sum(m.loss)))
        assert losses[-1] < losses[0]
        xi = np.asarray(ref.variables["xi"])
        # views saw different targets -> different corrections
        assert np.ptp(xi[0], axis=0).max() > 1e-6
        assert np.all(np.isfinite(np.asarray(m.pose_error)))

    def test_meshed_step_matches_single_device(self):
        """DP-2 invariant for the new step family: sharding the K*V*R ray
        axis over the mesh must not change the update."""
        from codenerf_tpu.eval.tto import (init_multiview_se3_refine_state,
                                           make_multiview_se3_refine_step)
        cfg, settings, state, dirs = _setup()
        K, V = 2, 2
        tto = self._mv_tto(state, cfg, K, V)
        targets = jnp.stack([
            jnp.stack([jnp.full((8, 8, 3), 0.3 + 0.2 * v)
                       for v in range(V)]) for _ in range(K)])
        key = jax.random.PRNGKey(11)
        results = []
        for mesh in (None, make_mesh()):
            ref, opt, base = init_multiview_se3_refine_state(tto,
                                                             cfg.optimizer)
            step = make_multiview_se3_refine_step(
                settings, opt, num_random_rays=32,
                regularizer_lambda=1e-5, perturb=True, mesh=mesh)
            s, m = step(ref, state.params, dirs, targets, base, base, key)
            results.append((s, m))
        (s1, m1), (s2, m2) = results
        np.testing.assert_allclose(np.asarray(m1.loss), np.asarray(m2.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s1.variables["z_s"]),
                                   np.asarray(s2.variables["z_s"]),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s1.variables["xi"]),
                                   np.asarray(s2.variables["xi"]),
                                   rtol=1e-4, atol=1e-7)
