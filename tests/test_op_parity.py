"""Per-op and per-layer numerical parity against the reference PyTorch math.

BASELINE.json config 1 (single spatial layer, CPU-runnable) and the per-layer
allclose requirement.  The reference modules are imported as a numerical
oracle; weights are copied through the state_dict importer so the same path
validates checkpoint restore.

Parity with ``norm_mode="reference"`` runs in float64: the dense-Lambda quirk
(SURVEY.md Q1) produces O(1e3) adjacency entries, and the resulting
catastrophic cancellation makes float32 elementwise comparison meaningless —
both frameworks carry ~0.5 absolute error vs a float64 oracle.  Exact float64
agreement proves the math is identical; a separate float32 test over the
sanely-normalized path covers production numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stgcn_tpu.graph import adjacency as adj
from stgcn_tpu.models.importer import import_state_dict
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.ops.block import block_forward
from stgcn_tpu.ops.spatial_conv import spatial_conv
from stgcn_tpu.ops.temporal_conv import temporal_conv

torch = pytest.importorskip("torch")

HI = jax.lax.Precision.HIGHEST


def _to_ours_layout(x_nchw: np.ndarray) -> np.ndarray:
    """(N, C, T, V) -> (N, T, V, C)"""
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _from_ours_layout(x_ntvc: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(x_ntvc), (0, 3, 1, 2))


def _spatial_params_from_ref(ref_sc, num_partitions: int) -> dict:
    w = ref_sc.W.weight.detach().numpy()  # (K*C_out, C_in, 1, 1)
    kco, c_in = w.shape[0], w.shape[1]
    c_out = kco // num_partitions
    return {
        "w": np.transpose(w.reshape(num_partitions, c_out, c_in), (2, 0, 1)),
        "b": ref_sc.W.bias.detach().numpy().reshape(num_partitions, c_out),
    }



@pytest.fixture()
def f64_reference():
    """Make ``.double()`` reference modules actually run in float64.

    The reference hardcodes ``.float()`` casts inside forward
    (st_graphconv.py:73,98), which would silently demote the float64 oracle
    back to float32; no-op the cast for the duration of a parity test.
    """
    orig = torch.Tensor.float
    torch.Tensor.float = lambda self: self
    try:
        yield
    finally:
        torch.Tensor.float = orig

@pytest.fixture(scope="module")
def A_ref():
    """Reference-mode (dense-Lambda) normalized distance-partition adjacency."""
    return adj.get_normalized_adjacency(adj.Strategy.DISTANCE, d=2,
                                        mode="reference").astype(np.float64)


class TestSpatialConvParity:
    def test_float64_exact(self, reference_modules, A_ref, rng):
        gc = reference_modules["graphconv"]
        N, C_in, C_out, T = 8, 2, 64, 100
        K = A_ref.shape[0]
        ref = gc.SpatialConv(C_in, C_out, torch.from_numpy(A_ref)).double()
        x = rng.standard_normal((N, C_in, T, 25))
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        params = {
            "w": ref.W.weight.detach().numpy()
                 .reshape(K, C_out, C_in).transpose(2, 0, 1),
            "b": ref.W.bias.detach().numpy().reshape(K, C_out),
        }
        got = spatial_conv(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(ref.A.detach().numpy()),
            jnp.asarray(_to_ours_layout(x)),
            precision=HI,
        )
        got = _from_ours_layout(got)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)

    def test_float32_symmetric_norm(self, reference_modules, rng):
        """Production-numerics check over the sane normalization path."""
        gc = reference_modules["graphconv"]
        A = adj.get_normalized_adjacency(adj.Strategy.DISTANCE, d=2,
                                         mode="symmetric")
        N, C_in, C_out, T = 8, 2, 64, 100
        K = A.shape[0]
        ref = gc.SpatialConv(C_in, C_out, torch.from_numpy(A))
        x = rng.standard_normal((N, C_in, T, 25)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        params = _spatial_params_from_ref(ref, K)
        got = spatial_conv(
            {k: jnp.asarray(v) for k, v in params.items()},
            jnp.asarray(ref.A.detach().numpy()),
            jnp.asarray(_to_ours_layout(x)), precision=HI)
        np.testing.assert_allclose(_from_ours_layout(got), want,
                                   rtol=1e-4, atol=1e-5)


class TestTemporalConvParity:
    def test_forward_allclose(self, rng):
        N, C, T, V, gamma, stride = 4, 32, 50, 25, 9, 2
        conv = torch.nn.Conv2d(C, C, (gamma, 1), stride=(stride, 1),
                               padding=((gamma - 1) // 2, 0))
        x = rng.standard_normal((N, C, T, V)).astype(np.float32)
        with torch.no_grad():
            want = conv(torch.from_numpy(x)).numpy()
        params = {
            "w": jnp.asarray(np.transpose(conv.weight.detach().numpy(),
                                          (2, 3, 1, 0))),
            "b": jnp.asarray(conv.bias.detach().numpy()),
        }
        got = temporal_conv(params, jnp.asarray(_to_ours_layout(x)),
                            stride=stride, precision=HI)
        np.testing.assert_allclose(_from_ours_layout(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_odd_length_stride2(self, rng):
        """Output length must match torch's floor((T + 2p - gamma)/s) + 1."""
        for T in (29, 30, 31):
            conv = torch.nn.Conv2d(8, 8, (9, 1), stride=(2, 1), padding=(4, 0))
            x = rng.standard_normal((1, 8, T, 25)).astype(np.float32)
            with torch.no_grad():
                want = conv(torch.from_numpy(x)).numpy()
            params = {
                "w": jnp.asarray(np.transpose(conv.weight.detach().numpy(),
                                              (2, 3, 1, 0))),
                "b": jnp.asarray(conv.bias.detach().numpy()),
            }
            got = temporal_conv(params, jnp.asarray(_to_ours_layout(x)),
                                stride=2, precision=HI)
            assert _from_ours_layout(got).shape == want.shape

    def test_impls_agree(self, rng):
        """All three formulations (conv primitive, block-Toeplitz matmul,
        shift_sum) compute the same op — values and gradients."""
        from stgcn_tpu.ops.temporal_conv import init_temporal_conv

        for (c_in, c_out, gamma, stride, T) in [
            (4, 6, 9, 1, 304), (6, 6, 9, 2, 304), (3, 5, 9, 1, 37),
            (4, 4, 5, 2, 50), (2, 3, 3, 1, 8),
        ]:
            params = init_temporal_conv(jax.random.key(1), c_in, c_out, gamma)
            x = jnp.asarray(rng.standard_normal((2, T, 25, c_in)), jnp.float32)

            def loss(p, x, impl):
                y = temporal_conv(p, x, stride=stride, impl=impl,
                                  precision=HI)
                return jnp.sum(jnp.sin(y)), y

            grads, outs = {}, {}
            for impl in ("conv", "block", "shift_sum"):
                (_, y), g = jax.value_and_grad(
                    loss, argnums=(0, 1), has_aux=True)(params, x, impl)
                outs[impl], grads[impl] = y, g
            for impl in ("block", "shift_sum"):
                np.testing.assert_allclose(outs[impl], outs["conv"],
                                           rtol=1e-4, atol=1e-4)
                jax.tree.map(
                    lambda a, b: np.testing.assert_allclose(
                        a, b, rtol=1e-3, atol=1e-4),
                    grads[impl], grads["conv"])


def _block_pytrees_from_ref(ref_block, num_partitions, residual):
    """Copy one SpatialTemporalConv's weights via the importer mapping."""
    sd = {f"conv.0.{k}": v for k, v in ref_block.state_dict().items()}
    sd["fc_layer.weight"] = np.zeros((1, 1))
    sd["fc_layer.bias"] = np.zeros(1)
    params, state = import_state_dict(sd, 1, num_partitions, residual=residual)
    return params["blocks"][0], state["blocks"][0]


class TestBlockParity:
    @pytest.mark.parametrize("residual,c_in,c_out,stride", [
        (False, 2, 64, 1),
        (False, 64, 128, 2),
        (True, 64, 64, 1),   # identity shortcut
        (True, 64, 128, 2),  # strided 1x1 projection shortcut
    ])
    @pytest.mark.parametrize("train", [False, True])
    def test_block_allclose_f64(self, reference_modules, A_ref, rng,
                                f64_reference,
                                residual, c_in, c_out, stride, train):
        gc = reference_modules["graphconv"]
        N, T = 4, 40
        K = A_ref.shape[0]
        gamma = 9
        ref = gc.SpatialTemporalConv(
            c_in, c_out, torch.from_numpy(A_ref), gamma, stride,
            (gamma - 1) // 2, dropout_rate=0, residual=residual).double()
        ref.train(train)
        # capture weights/state BEFORE the oracle forward mutates running stats
        params, state = _block_pytrees_from_ref(ref, K, residual)
        x = rng.standard_normal((N, c_in, T, 25))
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
        got, new_state = block_forward(
            params, state, jnp.asarray(_to_ours_layout(x)),
            jnp.asarray(A_ref), stride=stride, residual=residual,
            train=train, precision=HI)
        got = _from_ours_layout(got)
        if train:
            new_state = jax.tree.map(np.asarray, new_state)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
        if train:
            # running stats must track torch's biased-normalize /
            # unbiased-running semantics
            np.testing.assert_allclose(
                new_state["bn1"]["mean"], ref.batch_n.running_mean.numpy(),
                rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(
                new_state["bn1"]["var"], ref.batch_n.running_var.numpy(),
                rtol=1e-10, atol=1e-12)


class TestFullNetworkParity:
    @pytest.mark.parametrize("train", [False, True])
    def test_stgcn_inference_variant(self, reference_modules, rng, train,
                                     f64_reference):
        """Full 10-block stack vs the reference STGCN (src/network/stgcn.py).

        Uses uni-labeling + reference normalization + trained-adjacency
        semantics + final softmax — the exact quirk set of the inference
        variant (Q1, Q2, Q4, Q5).
        """
        import sys
        if "/root/reference/src" not in sys.path:
            sys.path.insert(0, "/root/reference/src")
        from network.stgcn import STGCN as RefSTGCN

        ref = RefSTGCN(C_in=2, gamma=9, nr_classes=6,
                       edge_importance=False).double()
        ref.train(train)
        # The inference variant hardwires dropout_rate=0.5
        # (st_graphconv.py:9); park just the dropout modules in eval so the
        # train-mode comparison exercises batch-stat BN without RNG noise.
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.eval()
        # capture weights/state BEFORE the oracle forward mutates running stats
        sd = {k: v.clone() for k, v in ref.state_dict().items()}
        N, T = 2, 30
        x = rng.standard_normal((N, T, 25, 2))
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()

        cfg = STGCNConfig(norm_mode="reference",
                          adjacency_mode="reference",
                          final_softmax=True, dtype=jnp.float64)
        model = STGCN(cfg)
        params, state = import_state_dict(sd, num_blocks=10,
                                          num_partitions=1)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
        got, _ = model.apply(params, state, jnp.asarray(x), train=train,
                             precision=HI)
        got = np.asarray(got)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


class TestGradientParity:
    """BASELINE.json config 4: gradient check vs the reference with
    edge-importance weighting on.

    Verifies the full quirk-Q2 semantics end to end in float64:

    * the per-layer ``spatialConv.A`` tensors (the adjacency itself) receive
      gradients that match ours exactly;
    * the ``Masks.{i}`` ParameterList receives NO gradient (SpatialConv
      re-wraps ``A * mask`` in a fresh nn.Parameter, detaching the mask);
    * conv / BN / classifier gradients match through the whole stack.
    """

    def test_full_network_grads_match_reference(self, reference_modules, rng,
                                                f64_reference):
        import sys
        if "/root/reference/src" not in sys.path:
            sys.path.insert(0, "/root/reference/src")
        from network.stgcn import STGCN as RefSTGCN

        ref = RefSTGCN(C_in=2, gamma=9, nr_classes=6,
                       edge_importance=True).double()
        ref.train(True)
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.eval()
        sd = {k: v.clone() for k, v in ref.state_dict().items()}

        N, T = 2, 30
        x = rng.standard_normal((N, T, 25, 2))
        y = rng.integers(0, 6, N)
        # the inference variant applies softmax in forward (Q4); feeding that
        # into cross_entropy reproduces the deprecated trainer's double
        # softmax (KTH_train_model.py:33,50) — on both sides
        out = ref(torch.from_numpy(x))
        loss = torch.nn.functional.cross_entropy(out, torch.from_numpy(y))
        loss.backward()

        # Q2: every mask must be gradient-free
        for name, p in ref.named_parameters():
            if name.startswith("Masks."):
                assert p.grad is None or float(p.grad.abs().max()) == 0.0, name
            elif name.endswith("spatialConv.A"):
                assert p.grad is not None and float(p.grad.abs().max()) > 0, name

        cfg = STGCNConfig(norm_mode="reference", adjacency_mode="reference",
                          final_softmax=True, dtype=jnp.float64)
        model = STGCN(cfg)
        params, state = import_state_dict(sd, num_blocks=10, num_partitions=1)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)

        def loss_fn(p):
            logits, _ = model.apply(p, state, jnp.asarray(x), train=True,
                                    precision=HI)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                logp, jnp.asarray(y)[:, None], axis=-1))

        ours = jax.grad(loss_fn)(params)

        # route torch grads through the same name mapping the params use
        grad_sd = {}
        for name, p in ref.named_parameters():
            grad_sd[name] = (p.grad if p.grad is not None
                             else torch.zeros_like(p)).numpy()
        for name, v in sd.items():  # running stats etc. (state, not params)
            grad_sd.setdefault(name, np.zeros_like(v.numpy()))
        want, _ = import_state_dict(grad_sd, num_blocks=10, num_partitions=1)

        flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
        flat_want = {tuple(str(k) for k in path): leaf for path, leaf in
                     jax.tree_util.tree_flatten_with_path(want)[0]}
        assert len(flat_ours) == len(flat_want)
        for path, g in flat_ours:
            key = tuple(str(k) for k in path)
            np.testing.assert_allclose(
                np.asarray(g), flat_want[key], rtol=1e-8, atol=1e-10,
                err_msg=f"gradient mismatch at {key}")


class TestAdamTrajectoryParity:
    """Multi-step optimizer parity vs the reference's configure_optimizers
    (src/lightning_model.py:196-197): torch.optim.Adam and optax.adam share
    the update rule (bias-corrected moments, eps outside the sqrt), so from
    identical imported init the float64 loss trajectories must agree to
    reduction-order noise over hundreds of steps.  This is the piece gradient
    parity alone does not cover: moment accumulation, bias correction, BN
    running-stat evolution and their feedback into subsequent steps.
    """

    def test_200_step_loss_trajectory(self, reference_modules, A_ref, rng,
                                      f64_reference):
        import optax

        gc = reference_modules["graphconv"]
        K = A_ref.shape[0]
        gamma = 9

        # A 2-block stack of the reference's OWN blocks (full 10-block f64
        # training is minutes-per-run on CPU; forward/grad parity of the full
        # stack is proven by TestFullNetworkParity/TestGradientParity — what
        # this test adds is the optimizer semantics over many steps, and the
        # reference block + torch Adam carry all of those).
        class TinyRef(torch.nn.Module):
            def __init__(self):
                super().__init__()
                A = torch.from_numpy(A_ref)
                self.conv = torch.nn.Sequential(
                    gc.SpatialTemporalConv(2, 8, A, gamma, 1,
                                           (gamma - 1) // 2,
                                           dropout_rate=0, residual=False),
                    gc.SpatialTemporalConv(8, 16, A, gamma, 2,
                                           (gamma - 1) // 2,
                                           dropout_rate=0, residual=False),
                )
                self.fc_layer = torch.nn.Linear(16, 6)

            def forward(self, x):  # (N, C, T, V) like the reference stack
                x = self.conv(x)
                x = torch.nn.functional.avg_pool2d(
                    x, (x.shape[2], x.shape[3])).flatten(1)
                return self.fc_layer(x)

        # the chaos-divergence window below is init-dependent: pin torch's
        # global RNG so earlier tests consuming it cannot shift the window
        torch.manual_seed(0)
        ref = TinyRef().double()
        ref.train(True)
        sd = {k: v.clone() for k, v in ref.state_dict().items()}

        steps, lr = 200, 1e-3
        n, t = 4, 32
        # a tiny 3-batch synthetic dataset, cycled — so the trajectory sees
        # repeated data (moment memory matters) but not a single fixed batch
        batches = [(rng.standard_normal((n, t, 25, 2)),
                    rng.integers(0, 6, n)) for _ in range(3)]

        opt_t = torch.optim.Adam(ref.parameters(), lr=lr)
        want = []
        for i in range(steps):
            x, y = batches[i % 3]
            opt_t.zero_grad()
            # plain cross-entropy on logits — the Lightning model's training
            # loss (src/lightning_model.py:202)
            loss = torch.nn.functional.cross_entropy(
                ref(torch.from_numpy(_from_ours_layout(x))),
                torch.from_numpy(y))
            loss.backward()
            opt_t.step()
            want.append(float(loss))

        cfg = STGCNConfig(plan=((8, 1), (16, 2)),
                          strategy=adj.Strategy.DISTANCE, d=2,
                          norm_mode="reference", adjacency_mode="reference",
                          dtype=jnp.float64)
        model = STGCN(cfg)
        params, state = import_state_dict(sd, num_blocks=2, num_partitions=K)
        params = jax.tree.map(jnp.asarray, params)
        state = jax.tree.map(jnp.asarray, state)
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, state, opt_state, x, y):
            def loss_fn(p):
                logits, new_state = model.apply(p, state, x, train=True,
                                                precision=HI)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.mean(jnp.take_along_axis(
                    logp, y[:, None], axis=-1))
                return nll, new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state, \
                opt_state, loss

        got = []
        for i in range(steps):
            x, y = batches[i % 3]
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jnp.asarray(x), jnp.asarray(y))
            got.append(float(loss))

        # Identical update rules diverge eventually even in float64: the
        # training map is chaotic, and reduction-order noise (~1e-16) grows
        # exponentially through Adam's sqrt(nu) denominators.  What separates
        # "same optimizer" from "different optimizer" is WHEN: a semantic
        # difference (eps placement, bias correction) shows up in step 2 at
        # ~1e-3; reduction noise needs >100 steps to surface above 1e-7.
        np.testing.assert_allclose(got[:120], want[:120],
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=1e-4)
        # the trajectory must actually move for this to be a real test
        assert abs(want[-1] - want[0]) > 0.5


class TestProductionTrajectoryParity:
    """Trajectory parity at the PRODUCTION shape (VERDICT r2 item 7): the
    full 10-block residual network, trained 40 steps from identical imported
    init vs torch — in f32 (tight-ish: reduction noise only) and in the bf16
    production compute mode (loose: bf16 rounding is ~1e-2/step and the
    training map amplifies it, so only the early trajectory and the overall
    descent are comparable).
    """

    @pytest.fixture(scope="class")
    def production_runs(self, reference_modules):
        import optax

        rng = np.random.default_rng(7)

        gc = reference_modules["graphconv"]
        gamma, pad = 9, 4
        cfg = STGCNConfig(strategy=adj.Strategy.DISTANCE, d=1,
                          norm_mode="symmetric", adjacency_mode="reference",
                          residual=True, dropout_rate=0.0)
        model = STGCN(cfg)
        A_t = torch.from_numpy(np.asarray(model.adjacency, np.float64)).float()

        class RefNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                plan = [(2, 64, 1), (64, 64, 1), (64, 64, 1), (64, 64, 1),
                        (64, 128, 2), (128, 128, 1), (128, 128, 1),
                        (128, 256, 2), (256, 256, 1), (256, 256, 1)]
                self.conv = torch.nn.Sequential(*[
                    gc.SpatialTemporalConv(ci, co, A_t, gamma, s, pad,
                                           dropout_rate=0.0, residual=True)
                    for ci, co, s in plan
                ])
                self.fc_layer = torch.nn.Linear(256, 6)

            def forward(self, x):  # (N, C, T, V)
                x = self.conv(x)
                x = torch.nn.functional.avg_pool2d(
                    x, (x.shape[2], x.shape[3])).flatten(1)
                return self.fc_layer(x)

        torch.manual_seed(0)
        ref = RefNet()
        ref.train(True)
        sd = {k: v.clone() for k, v in ref.state_dict().items()}

        steps, lr, n, t = 40, 1e-3, 2, 20
        batches = [(rng.standard_normal((n, t, 25, 2)).astype(np.float32),
                    rng.integers(0, 6, n)) for _ in range(3)]

        opt_t = torch.optim.Adam(ref.parameters(), lr=lr)
        want = []
        for i in range(steps):
            x, y = batches[i % 3]
            opt_t.zero_grad()
            loss = torch.nn.functional.cross_entropy(
                ref(torch.from_numpy(_from_ours_layout(x))),
                torch.from_numpy(y))
            loss.backward()
            opt_t.step()
            want.append(float(loss))

        def run_ours(compute_dtype):
            import dataclasses as dc

            m = STGCN(dc.replace(cfg, compute_dtype=compute_dtype))
            params, state = import_state_dict(sd, num_blocks=10,
                                              num_partitions=m.num_partitions,
                                              residual=True)
            params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                                  params)
            state = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), state)
            opt = optax.adam(lr)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, state, opt_state, x, y):
                def loss_fn(p):
                    logits, new_state = m.apply(p, state, x, train=True)
                    logits = logits.astype(jnp.float32)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    return -jnp.mean(jnp.take_along_axis(
                        logp, y[:, None], axis=-1)), new_state

                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_state, \
                    opt_state, loss

            got = []
            for i in range(steps):
                x, y = batches[i % 3]
                params, state, opt_state, loss = step(
                    params, state, opt_state, jnp.asarray(x), jnp.asarray(y))
                got.append(float(loss))
            return got

        return {"want": want, "f32": run_ours(None),
                "bf16": run_ours(jnp.bfloat16)}

    def test_f32_production_trajectory(self, production_runs):
        want, got = production_runs["want"], production_runs["f32"]
        # Step 0 is identical math on identical params: must agree to f32.
        # Beyond that, f32 reduction-order noise (~1e-6 rel between torch and
        # XLA summation orders) amplifies through the 10-block training map
        # at roughly a decade per step (measured: 1% divergence by step 2),
        # so only the early steps and the overall descent are comparable —
        # the tight optimizer-semantics certification is the f64 2-block
        # trajectory test above.
        np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
        np.testing.assert_allclose(got[:3], want[:3], rtol=2e-2)
        assert np.mean(got[-8:]) < got[0]
        assert np.mean(want[-8:]) < want[0]
        final_want, final_got = np.mean(want[-8:]), np.mean(got[-8:])
        assert abs(final_got - final_want) < max(0.5, 0.35 * final_want), (
            final_got, final_want)

    def test_bf16_production_trajectory(self, production_runs):
        want, got = production_runs["want"], production_runs["bf16"]
        # bf16 production mode: early steps track f32 to bf16 rounding; the
        # full trajectory must descend comparably (same data, same updates)
        np.testing.assert_allclose(got[:5], want[:5], rtol=3e-2, atol=3e-2)
        assert got[-1] < got[0]
        final_want = np.mean(want[-8:])
        final_got = np.mean(got[-8:])
        assert abs(final_got - final_want) < max(0.5, 0.35 * final_want), (
            final_got, final_want)
