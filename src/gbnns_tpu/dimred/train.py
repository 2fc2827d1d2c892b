"""Triplet-loss trainer for the learned projection.

Capability parity: the reference's offline PyTorch training script
(SURVEY.md §4.2): sample (anchor, positive = true near neighbor,
negative), hinge triplet loss ``max(0, m + d(f(a),f(p)) − d(f(a),f(n)))``,
SGD/Adam, projection written to disk (BASELINE.json:5 "triplet/contrastive
loss over sampled anchors"). TPU-first re-architecture:

  * the whole epoch loop is one jit'd ``lax.scan`` over steps — sampling
    (jax.random inside the graph), projection, loss, and the optax update
    all fuse; no host↔device traffic during training;
  * positives are drawn from the precomputed kNN graph / ground-truth rows
    (the graph artifact doubles as the supervision set, exactly the
    reference's data flow);
  * negatives: uniform corpus samples plus in-batch hard negatives
    (the hardest violating example inside the projected batch — free on
    TPU since the batch distance matrix is one MXU matmul).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gbnns_tpu.dimred.models import apply_model, init_model, make_model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    d_out: int
    model: str = "linear"          # "linear" | "mlp"
    hidden: int = 512              # mlp only
    metric: str = "l2"             # "l2" | "ip" | "angular"
    # Hinge margin in the metric's own units; None resolves per metric:
    # 1.0 for (squared) l2, 0.05 for ip/angular where distances live in
    # [-1, 1] (a 1.0 margin there demands impossible separations and was
    # measured to halve downstream recall on angular corpora).
    margin: float | None = None
    lr: float = 1e-3
    batch_size: int = 1024
    steps: int = 2000
    k_pos: int = 10                # positives drawn from top-k_pos true NNs
    hard_negatives: bool = True
    # Graph-mined negatives: sample each anchor's negative from its own GT
    # ranks [lo, hi) instead of uniformly from the corpus. These are the
    # confusable near-misses whose ordering the projection must preserve —
    # a uniform negative is usually so far away the hinge is trivially
    # satisfied and contributes no gradient (the reference's known weakness
    # on angular corpora, VERDICT round 1 item 5). Requires ``neighbors``
    # rows at least ``hi`` wide. None = uniform negatives (reference
    # behavior, SURVEY §4.2).
    neg_ranks: tuple[int, int] | None = None
    init: str = "pca"              # linear model init: "pca" | "orthogonal"
    # Validation-gated checkpoint selection: every ``eval_every`` steps,
    # score NN-ordering preservation on a held-out query split — the
    # fraction of each query's true top-10 (its ``neighbors`` row, exact
    # full-d NNs) retained in its projected top-``val_c`` over the whole
    # training corpus — and return the best checkpoint seen, INCLUDING
    # the step-0 init. Measured round 5: the hinge recipe can train
    # BELOW its own PCA init on Gaussian-like corpora (recall@c=16
    # 0.9912 → 0.9768 at 1M, results/train_recipe_ab_1m.json); selection
    # makes "learned ≥ its init" structural instead of hoped-for.
    # 0 = off (return the final step, the reference's behavior).
    eval_every: int = 0
    val_queries: int = 1024
    val_c: int = 16
    seed: int = 0

    @property
    def normalize(self) -> bool:
        return self.metric == "angular"


def _sq_dist(a, b):
    diff = a - b
    return jnp.sum(diff * diff, axis=-1)


def _pair_dist(a, b, metric):
    if metric in ("ip", "angular"):
        return -jnp.sum(a * b, axis=-1)
    return _sq_dist(a, b)


def train_projection(base, neighbors, cfg: TrainConfig,
                     *, log_every: int = 0) -> dict[str, Any]:
    """Train f: R^d → R^{d_out} so neighbor ordering survives projection.

    ``base``: (n, d) corpus; ``neighbors``: (n, >=k_pos) int32 rows of each
    node's true near neighbors (kNN-graph artifact or exact GT).
    Returns {"params", "model", "cfg", "losses"}.
    """
    base = jnp.asarray(np.asarray(base, dtype=np.float32))
    need_cols = cfg.k_pos
    if cfg.neg_ranks is not None:
        lo, hi = cfg.neg_ranks
        if not (cfg.k_pos <= lo < hi):
            raise ValueError(f"neg_ranks must satisfy k_pos <= lo < hi, got "
                             f"{cfg.neg_ranks} with k_pos={cfg.k_pos}")
        need_cols = max(need_cols, hi)
    if neighbors.shape[1] < need_cols:
        # JAX gathers clamp out-of-range indices, which would silently bias
        # positive sampling toward the last column — fail loudly instead.
        raise ValueError(f"neighbors has {neighbors.shape[1]} columns but "
                         f"{need_cols} are needed (k_pos={cfg.k_pos}, "
                         f"neg_ranks={cfg.neg_ranks}); widen the GT rows")
    neighbors = jnp.asarray(np.asarray(neighbors[:, :need_cols], dtype=np.int32))
    n, d = base.shape
    margin = cfg.margin if cfg.margin is not None else (
        1.0 if cfg.metric == "l2" else 0.05)
    model = make_model(cfg.model, cfg.d_out, hidden=cfg.hidden,
                       normalize=cfg.normalize)
    params = init_model(model, d, seed=cfg.seed)
    if cfg.model == "linear" and cfg.init == "pca":
        # Start from the classical optimum and let the triplet loss improve
        # on it (on well-conditioned corpora PCA is already strong; random
        # init wastes most of the step budget rediscovering it).
        from gbnns_tpu.dimred.pca import pca_fit

        pca = pca_fit(np.asarray(base), cfg.d_out)
        params = {"params": {"proj": {"kernel": jnp.asarray(pca.components)}}}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    def loss_fn(params, key, base, neighbors):
        ka, kp, kn = jax.random.split(key, 3)
        a_idx = jax.random.randint(ka, (cfg.batch_size,), 0, n)
        p_col = jax.random.randint(kp, (cfg.batch_size,), 0, cfg.k_pos)
        p_idx = neighbors[a_idx, p_col]
        if cfg.neg_ranks is not None:
            n_col = jax.random.randint(kn, (cfg.batch_size,),
                                       cfg.neg_ranks[0], cfg.neg_ranks[1])
            n_idx = neighbors[a_idx, n_col]
        else:
            n_idx = jax.random.randint(kn, (cfg.batch_size,), 0, n)

        fa = apply_model(model, params, base[a_idx])
        fp = apply_model(model, params, base[p_idx])
        fn_ = apply_model(model, params, base[n_idx])

        d_ap = _pair_dist(fa, fp, cfg.metric)
        d_an = _pair_dist(fa, fn_, cfg.metric)
        loss = jnp.maximum(0.0, margin + d_ap - d_an)

        if cfg.hard_negatives:
            # In-batch hard negatives: for each anchor, the most-violating
            # other-anchor projection. One (B, B) MXU matmul.
            if cfg.metric in ("ip", "angular"):
                dmat = -(fa @ fn_.T)
            else:
                dmat = (jnp.sum(fa * fa, -1)[:, None]
                        - 2.0 * (fa @ fn_.T) + jnp.sum(fn_ * fn_, -1)[None, :])
            # Exclude coincidental positives: same id as anchor or its pos.
            same = (n_idx[None, :] == a_idx[:, None]) | (n_idx[None, :] == p_idx[:, None])
            dmat = jnp.where(same, jnp.inf, dmat)
            d_hard = jnp.min(dmat, axis=1)
            loss = loss + jnp.maximum(0.0, margin + d_ap - d_hard)
        return jnp.mean(loss)

    # base/neighbors are jit ARGUMENTS, not closures: a closed-over corpus
    # becomes an embedded program constant, and at GIST scale (100k x 960 =
    # 384 MB) that blew the remote-compile request size limit (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def run(params, opt_state, key, base, neighbors, n_steps):
        def step(carry, key):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, key, base,
                                                      neighbors)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
        return params, opt_state, losses

    if not cfg.eval_every:
        params, opt_state, losses = run(params, opt_state,
                                        jax.random.PRNGKey(cfg.seed + 1),
                                        base, neighbors, cfg.steps)
        losses = np.asarray(losses)
        if log_every:
            for i in range(0, cfg.steps, log_every):
                print(f"  step {i}: loss {losses[i]:.4f}", flush=True)
        return {"params": params, "model": model, "cfg": cfg, "losses": losses}

    # ---- validation-gated checkpoint selection (see TrainConfig) -------
    vq = jax.random.permutation(
        jax.random.PRNGKey(cfg.seed + 7), n)[:min(cfg.val_queries, n)]
    val_gt = neighbors[vq, :min(10, neighbors.shape[1])]

    @jax.jit
    def val_score(params, base, vq, val_gt):
        """Mean fraction of true top-10 retained in the projected
        top-val_c over the whole training corpus (self excluded)."""
        lo = apply_model(model, params, base)          # (n, d_out)
        qlo = lo[vq]
        if cfg.metric in ("ip", "angular"):
            scores = qlo @ lo.T
        else:
            scores = (2.0 * (qlo @ lo.T)
                      - jnp.sum(lo * lo, -1)[None, :])  # -d² + const
        # mask self: the query IS a corpus row and always ranks first
        scores = scores.at[jnp.arange(vq.shape[0]), vq].set(-jnp.inf)
        _, top = jax.lax.top_k(scores, cfg.val_c)
        hits = (top[:, None, :] == val_gt[:, :, None]).any(-1)
        return jnp.mean(hits)

    key = jax.random.PRNGKey(cfg.seed + 1)
    best = (float(val_score(params, base, vq, val_gt)), params, 0)
    history = [best[0]]
    losses_parts = []
    done = 0
    while done < cfg.steps:
        seg = min(cfg.eval_every, cfg.steps - done)
        key, sub = jax.random.split(key)
        params, opt_state, seg_losses = run(params, opt_state, sub,
                                            base, neighbors, seg)
        losses_parts.append(np.asarray(seg_losses))
        done += seg
        score = float(val_score(params, base, vq, val_gt))
        history.append(score)
        if score > best[0]:
            best = (score, params, done)
        if log_every:
            print(f"  step {done}: loss {losses_parts[-1][-1]:.4f} "
                  f"val@{cfg.val_c} {score:.4f}", flush=True)
    losses = np.concatenate(losses_parts) if losses_parts else np.zeros(0)
    return {"params": best[1], "model": model, "cfg": cfg, "losses": losses,
            "val_history": np.asarray(history), "best_step": best[2],
            "best_val": best[0]}


def project(trained: dict[str, Any], x, *, chunk: int = 262144) -> np.ndarray:
    """Apply the trained projection to (m, d), streamed in chunks."""
    x = np.asarray(x)
    model, params = trained["model"], trained["params"]
    apply_jit = jax.jit(lambda xc: apply_model(model, params, xc))
    outs = [np.asarray(apply_jit(jnp.asarray(x[off:off + chunk])))
            for off in range(0, len(x), chunk)]
    return np.concatenate(outs, axis=0)


def save_projection(path: str, trained: dict[str, Any]) -> None:
    """Checkpoint the projection (stage boundary, SURVEY §5.4): flat npz of
    parameter leaves + config; loadable without unpickling arbitrary code."""
    cfg = trained["cfg"]
    flat = jax.tree_util.tree_flatten_with_path(trained["params"])[0]
    arrays = {_path_str(path_): np.asarray(v) for path_, v in flat}
    np.savez(path, __cfg__=np.array([repr(dataclasses.asdict(cfg))]), **arrays)


def _path_str(path) -> str:
    """'params/proj/kernel'-style key from a tree_flatten_with_path path."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def load_projection(path: str) -> dict[str, Any]:
    import ast

    data = np.load(path, allow_pickle=False)
    cfg = TrainConfig(**ast.literal_eval(str(data["__cfg__"][0])))
    model = make_model(cfg.model, cfg.d_out, hidden=cfg.hidden,
                       normalize=cfg.normalize)
    # Rebuild the pytree by initializing a skeleton and filling leaves.
    first_layer = "hidden" if cfg.model == "mlp" else "proj"
    d_in = next(data[k].shape[0] for k in data.files
                if first_layer in k and k.endswith("kernel"))
    params = init_model(model, d_in, seed=cfg.seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    rebuilt = []
    for path_, v in flat:
        rebuilt.append(jnp.asarray(data[_path_str(path_)]))
    params = jax.tree_util.tree_unflatten(treedef, rebuilt)
    return {"params": params, "model": model, "cfg": cfg, "losses": None}
