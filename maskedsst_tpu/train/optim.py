"""Optimizers and LR schedulers with reference-parity semantics.

Reference recipes (src/utils.py:36-59, pretrain.py:69-73, finetune.py:110-142):

* pretrain: AdamW(lr 8e-3, wd 0.05) with an **elementwise** gradient clamp to
  [-1, 1] registered as a per-parameter hook (pretrain.py:71-73 — despite the
  config key ``clip_grad_norm`` it is a value clamp, not a norm clip);
* finetune: torch Adam(weight_decay) — i.e. *coupled* L2 added to the
  gradient before the moment estimates (unlike AdamW) — with a separate LR
  for the classifier head vs the backbone, or head-only training for linear
  eval;
* schedulers: ReduceLROnPlateau(factor 0.9, patience 5) driven by the mean
  validation loss, or cosine annealing (T_max 50).

LR mutability: the learning rate enters the jitted step as a traced scalar in
the optimizer state (``optax.inject_hyperparams``), so host-side plateau
scheduling never triggers recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax


def _adamw_core(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def _adam_l2_core(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=wd): L2 term added to the gradient before
    the Adam moments (coupled, not decoupled)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def flatten_transform(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``tx`` over one ravelled parameter vector instead of per-leaf.

    NOTE: device-time profiling showed flat and per-leaf are IDENTICAL in
    step time under jit (33.83 vs 33.85 ms/step measured on v5e — XLA fuses
    the per-leaf ops; the old "~1.8 ms/step per-leaf cost" was a
    wall-clock-era artifact, see CLAUDE.md). flatten is kept only for
    CHECKPOINT-STATE stability: the optimizer state is two [N] vectors
    regardless of param-tree refactors. Hyperparameter injection still
    works (state structure is unchanged); per-group transforms
    (multi_transform) must NOT be wrapped — labels would collapse to the
    single flat leaf.

    Compatibility: the optimizer-state pytree stores flat [N] moment vectors,
    so full-state checkpoints written WITHOUT flatten cannot restore into a
    flattened trainer (and vice versa) — pick one per training run."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        return tx.init(ravel_pytree(params)[0])

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        upd, state = tx.update(flat_g, state, flat_p)
        return unravel(upd), state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    name: str,
    learning_rate: float,
    weight_decay: float = 0.0,
    *,
    grad_clamp: Optional[float] = None,
    head_lr: Optional[float] = None,
    head_label_fn: Optional[Callable[[tuple], bool]] = None,
    linear_eval: bool = False,
    momentum: float = 0.0,
    flatten: bool = False,
) -> optax.GradientTransformation:
    """Build the optax chain for a reference recipe.

    Args:
      name: "Adam" (coupled L2, finetune) or "AdamW" (decoupled, pretrain) or
        "SGD" (momentum 0.9 + L2, the li baseline recipe,
        DeepHyperX/models.py:80-82).
      grad_clamp: elementwise clamp bound (reference hook clamp(-1,1)).
      head_lr: if set (and != learning_rate), parameters whose path satisfies
        ``head_label_fn`` train with this LR instead (finetune.py:120-130).
      head_label_fn: path predicate marking classifier-head params; required
        for head_lr / linear_eval. Receives the flattened key path tuple.
      linear_eval: freeze everything except head params (finetune.py:110-115).
    """

    def core(lr: float) -> optax.GradientTransformation:
        if name == "AdamW":
            return optax.inject_hyperparams(_adamw_core)(lr, weight_decay)
        if name == "Adam":
            return optax.inject_hyperparams(_adam_l2_core)(lr, weight_decay)
        if name == "SGD":
            def sgd(learning_rate, wd):
                return optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.sgd(learning_rate, momentum=momentum if momentum else None),
                )
            return optax.inject_hyperparams(sgd)(lr, weight_decay)
        if name == "Adagrad":
            def adagrad(learning_rate, wd):
                return optax.chain(
                    optax.add_decayed_weights(wd),
                    # torch Adagrad defaults (the 'he' zoo recipe):
                    # accumulator starts at 0 and eps 1e-10; optax's own
                    # defaults (0.1 / 1e-7) shrink every early update
                    optax.adagrad(
                        learning_rate,
                        initial_accumulator_value=0.0,
                        eps=1e-10,
                    ),
                )
            return optax.inject_hyperparams(adagrad)(lr, weight_decay)
        if name == "Adadelta":
            def adadelta(learning_rate, wd):
                return optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.adadelta(learning_rate),
                )
            return optax.inject_hyperparams(adadelta)(lr, weight_decay)
        raise ValueError(f"unknown optimizer {name!r}")

    needs_groups = linear_eval or (head_lr is not None and head_lr != learning_rate)
    if needs_groups:
        assert head_label_fn is not None, "head_label_fn required for param groups"

        def label_tree(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "head" if head_label_fn(tuple(k.key for k in path)) else "rest",
                params,
            )

        transforms: Dict[str, Any] = {
            "head": core(head_lr if head_lr is not None else learning_rate),
            "rest": optax.set_to_zero() if linear_eval else core(learning_rate),
        }
        tx = optax.multi_transform(transforms, label_tree)
    else:
        tx = core(learning_rate)

    if grad_clamp is not None:
        tx = optax.chain(optax.clip(grad_clamp), tx)
    if flatten:
        assert not needs_groups, "flatten is incompatible with param groups"
        tx = flatten_transform(tx)
    return tx


def set_learning_rate(opt_state, scale_or_value: float, *, scale: bool = True):
    """Update every injected ``learning_rate`` hyperparameter in an optimizer
    state (host-side scheduler hook). ``scale=True`` multiplies, else sets."""

    def visit(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or (
            hasattr(node, "hyperparams") and isinstance(getattr(node, "hyperparams"), dict)
        ):
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                new = hp["learning_rate"] * scale_or_value if scale else hp["learning_rate"] * 0 + scale_or_value
                hp["learning_rate"] = new
            return node._replace(hyperparams=hp) if hasattr(node, "_replace") else node
        return node

    return jax.tree.map(
        visit,
        opt_state,
        is_leaf=lambda n: hasattr(n, "hyperparams") and isinstance(getattr(n, "hyperparams", None), dict),
    )


def set_learning_rates(opt_state, values) -> "tuple":
    """Set each injected ``learning_rate`` to the corresponding entry of
    ``values``, in the same tree order :func:`get_learning_rates` reports
    (per-group absolute setter — the uniform :func:`set_learning_rate`
    cannot express distinct group values)."""
    it = iter([float(v) for v in values])

    def visit(node):
        if hasattr(node, "hyperparams") and isinstance(getattr(node, "hyperparams"), dict):
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = hp["learning_rate"] * 0 + next(it)
            return node._replace(hyperparams=hp) if hasattr(node, "_replace") else node
        return node

    return jax.tree.map(
        visit,
        opt_state,
        is_leaf=lambda n: hasattr(n, "hyperparams") and isinstance(getattr(n, "hyperparams", None), dict),
    )


def get_learning_rates(opt_state) -> list:
    """All injected learning-rate values in the optimizer state, in tree order."""
    rates = []

    def visit(node):
        if hasattr(node, "hyperparams") and isinstance(getattr(node, "hyperparams", None), dict):
            if "learning_rate" in node.hyperparams:
                rates.append(float(node.hyperparams["learning_rate"]))
        return node

    jax.tree.map(
        visit,
        opt_state,
        is_leaf=lambda n: hasattr(n, "hyperparams") and isinstance(getattr(n, "hyperparams", None), dict),
    )
    return rates


class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch semantics (mode='min',
    factor, patience, rel threshold 1e-4): after ``patience`` epochs without
    the metric improving below best*(1-threshold), multiply all LRs by
    ``factor`` (src/utils.py:46-49)."""

    def __init__(self, factor: float = 0.9, patience: int = 5, threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Returns True when the LR should be reduced this epoch."""
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
            return False
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return True
        return False

    def update(self, opt_state, metric: float):
        if self.step(metric):
            opt_state = set_learning_rate(opt_state, self.factor, scale=True)
        return opt_state

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: dict):
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]


class MultiStepLR:
    """torch MultiStepLR(milestones, gamma): multiply the LR by gamma at each
    milestone epoch (the sharma recipe, DeepHyperX/models.py:137-143).
    ``update`` accepts (and ignores) a metric so callers can drive it through
    the same interface as ReduceLROnPlateau."""

    def __init__(self, milestones, gamma: float = 0.1):
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = gamma
        self.epoch = 0

    def update(self, opt_state, metric: float = None):
        self.epoch += 1
        if self.epoch in self.milestones:
            opt_state = set_learning_rate(opt_state, self.gamma, scale=True)
        return opt_state

    def state_dict(self) -> dict:
        return {"epoch": self.epoch}

    def load_state_dict(self, state: dict):
        self.epoch = state["epoch"]


class CosineAnnealingLR:
    """torch CosineAnnealingLR(T_max, eta_min=0) equivalent, host-side
    (src/utils.py:50-57): per group g, lr_g(t) = eta_min + (base_g -
    eta_min) * (1 + cos(pi * t / T_max)) / 2.

    Group bases are captured from the optimizer state on the first update
    and each epoch SETS the closed-form value per group (torch keeps
    ``base_lrs`` the same way). The earlier ratio-chaining implementation
    lost the per-group ratios permanently once the cosine reached eta_min
    at t == T_max (scale-by-zero destroys them; the absolute-overwrite
    recovery collapsed head and backbone to one LR for the rest of the
    run)."""

    def __init__(self, base_lr: float, t_max: int = 50, eta_min: float = 0.0):
        self.base_lr = base_lr
        self.t_max = t_max
        self.eta_min = eta_min
        self.epoch = 0
        self._group_bases = None  # captured from opt_state on first update

    def _cos_factor(self, epoch: int) -> float:
        import math

        return (1 + math.cos(math.pi * epoch / self.t_max)) / 2

    def _value(self, base: float, epoch: int) -> float:
        return self.eta_min + (base - self.eta_min) * self._cos_factor(epoch)

    def current(self) -> float:
        return self._value(self.base_lr, self.epoch)

    def step(self) -> float:
        self.epoch += 1
        return self.current()

    def _capture_bases(self, opt_state):
        rates = get_learning_rates(opt_state)
        if not rates:
            self._group_bases = [self.base_lr]
            return
        c = self._cos_factor(self.epoch)
        if self.epoch == 0 or c <= 0.0:
            # fresh state (rates ARE the bases), or an un-invertible resume
            # exactly at t_max from a pre-round-5 sidecar without bases —
            # treat current rates as bases (exact in the fresh case)
            self._group_bases = [float(r) for r in rates]
        else:
            # resume mid-anneal from a sidecar without bases: invert the
            # closed form at the restored epoch
            self._group_bases = [
                self.eta_min + (float(r) - self.eta_min) / c for r in rates
            ]

    def update(self, opt_state, metric: float = None):
        """Advance one epoch and set every group's closed-form LR. Accepts
        (and ignores) a metric so callers can drive all schedulers through
        one interface (see MultiStepLR)."""
        if self._group_bases is None:
            self._capture_bases(opt_state)
        self.epoch += 1
        values = [self._value(b, self.epoch) for b in self._group_bases]
        return set_learning_rates(opt_state, values)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "group_bases": self._group_bases}

    def load_state_dict(self, state: dict):
        self.epoch = state["epoch"]
        self._group_bases = state.get("group_bases")
