"""Train state, optimizer, and the jitted SPMD train step.

Replaces the reference's PyTorch-Lightning plumbing (model_wrapper.py:87-105
configure_optimizers; 75-85 freeze_parameters; train.py:67-79 DDP) with:
  - optax Adam + weight decay 1e-5 + linear warmup (lr/warmup -> lr);
  - stage-2 freezing as an optax.multi_transform mask over param-path
    substrings (no `find_unused_parameters` machinery — XLA sees a static
    graph and frozen params simply get zero updates);
  - ONE jitted train step: batch prep + forward + losses + grads + update.
    Data parallelism comes from sharding the batch leaves over a
    `jax.sharding.Mesh` "data" axis — jit inserts the gradient psums
    (SURVEY.md §2.5 TPU-native plan).
"""

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.struct
import flax.traverse_util
import jax
import jax.numpy as jnp
import optax

from ..models.decoders import action_param_pattern
from ..models.model import Model, StepCtx, step_schedules
from .losses import LossCfg, action_loss, perception_loss
from .prepare import RawBatch, prepare_training_batch


@dataclass(frozen=True)
class TrainCfg:
    """training.optim + data knobs (configurations/config.yaml:18-23)."""

    mode: str = "perception"  # perception | action
    lr: float = 1e-4
    weight_decay: float = 1e-5
    warm_up_steps: int = 10000
    rays_per_batch: int = 256
    loss: LossCfg = field(default_factory=LossCfg)
    # Exact-mode stabilizers (r4 knot study: the exact feature path
    # concentrates gradients onto few encoder texels and 2/3 seeds collapse
    # at reference scale — benchmarks/RESULTS.md). Both default OFF so the
    # reference optimizer semantics (model_wrapper.py:87-105) are unchanged.
    grad_clip_norm: Optional[float] = None  # optax.clip_by_global_norm
    encoder_lr_scale: float = 1.0  # stage-1 lr multiplier on encoder/* params
    # per-step min/max of every model input/target tensor (the reference's
    # sanity/* stream, model_wrapper.py:164-173 + logging_utils.py:6-19)
    log_sanity: bool = False


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Optional[Any]
    opt_state: Any
    # proposal-sampler update counter (ray_samplers.py:492-495)
    steps_since_update: jax.Array


def trainable_mask(params, mode: str, action_decoder_cfg) -> Any:
    """Pytree of {'trainable','frozen'} labels.

    Stage 2 ("action") trains ONLY decoder params whose path contains the
    decoder's action pattern (model_wrapper.py:75-85 +
    action_decoder_jacobian.py:251-258); everything else is frozen.
    """
    flat = flax.traverse_util.flatten_dict(params)
    if mode == "action":
        pattern = action_param_pattern(action_decoder_cfg)
        labels = {
            k: ("trainable" if (k[0] == "decoder" and any(pattern in part for part in k))
                else "frozen")
            for k in flat
        }
    else:
        labels = {k: "trainable" for k in flat}
    return flax.traverse_util.unflatten_dict(labels)


def make_optimizer(cfg: TrainCfg, params=None, action_decoder_cfg=None):
    """Adam(lr, wd=1e-5) + LinearLR(1/warmup -> 1) (model_wrapper.py:87-105).

    torch.optim.Adam's weight_decay adds wd*param to the gradient BEFORE the
    moment updates — optax ordering: add_decayed_weights -> scale_by_adam.
    """
    def adam_chain(lr_mult: float = 1.0):
        schedule = optax.linear_schedule(
            init_value=cfg.lr * lr_mult / cfg.warm_up_steps,
            end_value=cfg.lr * lr_mult,
            transition_steps=cfg.warm_up_steps,
        )
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )

    if cfg.mode == "action":
        assert params is not None and action_decoder_cfg is not None
        labels = trainable_mask(params, cfg.mode, action_decoder_cfg)
        tx = optax.multi_transform(
            {"trainable": adam_chain(), "frozen": optax.set_to_zero()}, labels
        )
    elif cfg.encoder_lr_scale != 1.0:
        assert params is not None
        flat = flax.traverse_util.flatten_dict(params)
        labels = flax.traverse_util.unflatten_dict(
            {k: ("encoder" if k[0] == "encoder" else "other") for k in flat})
        tx = optax.multi_transform(
            {"encoder": adam_chain(cfg.encoder_lr_scale),
             "other": adam_chain()}, labels)
    else:
        tx = adam_chain()
    if cfg.grad_clip_norm is not None:
        # clip BEFORE decay/Adam, matching how a torch user clips grads
        # ahead of optimizer.step()
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(key: jax.Array, model: Model, sample_batch: RawBatch,
                       cfg: TrainCfg, init_params=None, init_batch_stats=None) -> TrainState:
    """Initialize params + optimizer. `init_params` warm-starts stage 2 from
    stage-1 weights with a FRESH optimizer state (train.py:54-58 semantics —
    "so that optimization restarts")."""
    k_init, k_prep, k_samp = jax.random.split(key, 3)
    mi, _ = prepare_training_batch(k_prep, sample_batch, cfg.rays_per_batch, mode="perception")
    ctx = StepCtx(key=k_samp, anneal=jnp.asarray(1.0), updated=jnp.asarray(True))
    variables = model.init(k_init, mi, ctx, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if init_params is not None:
        params = merge_compatible_params(params, init_params)
        if init_batch_stats is not None:
            batch_stats = init_batch_stats
    tx = make_optimizer(cfg, params, model.cfg.action_decoder)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        steps_since_update=jnp.asarray(0, jnp.int32),
    )


def merge_compatible_params(template, loaded, report: list = None):
    """Shape-tolerant warm start: keep `loaded` entries whose path+shape match
    `template`, skip the rest (model_wrapper.py:553-573 on_load_checkpoint —
    the reference logs every skipped key; so do we).

    Prints a one-line kept/dropped summary plus a (path, reason) line per
    mismatch, and warns loudly if NOTHING matched (a silent from-scratch
    "warm start" is the failure mode this guards). Mismatch details are also
    appended to `report` if given.
    """
    flat_t = flax.traverse_util.flatten_dict(template)
    flat_l = flax.traverse_util.flatten_dict(loaded)
    merged, kept, details = {}, 0, []
    for k, v in flat_t.items():
        lv = flat_l.get(k)
        if lv is not None and jnp.shape(lv) == jnp.shape(v):
            merged[k] = lv
            kept += 1
        else:
            merged[k] = v
            path = "/".join(map(str, k))
            reason = (
                "missing from checkpoint" if lv is None
                else f"shape mismatch ckpt{tuple(jnp.shape(lv))} vs model{tuple(jnp.shape(v))}"
            )
            details.append((path, reason))
    for k in flat_l:
        if k not in flat_t:
            details.append(("/".join(map(str, k)), "not in model (dropped)"))
    if report is not None:
        report.extend(details)
    print(f"warm start: kept {kept}/{len(flat_t)} model params from checkpoint"
          f" ({len(details)} mismatches)")
    for path, reason in details:
        print(f"  warm start skip: {path}: {reason}")
    if kept == 0 and len(flat_t) > 0:
        print("WARNING: warm start matched NOTHING — training from scratch; "
              "check that the checkpoint belongs to this model config")
    return flax.traverse_util.unflatten_dict(merged)


def host_step_schedule(step: int, steps_since_update: int, rendering_cfg):
    """Host-side mirror of `step_schedules`' update gate (same arithmetic on
    Python scalars): returns (updated, new_steps_since_update). Used by the
    train loop / bench to pick between the two statically-gated compiled
    step variants (see make_train_step's `static_updated`)."""
    sched = min(max(
        step / rendering_cfg.proposal_warmup * rendering_cfg.proposal_update_every,
        1.0), float(rendering_cfg.proposal_update_every))
    updated = (steps_since_update > sched) or (step < 10)
    return updated, (0 if updated else steps_since_update) + 1


def stop_frozen_gradients(params, mode: str, action_decoder_cfg):
    """Stage 2 ("action"): stop_gradient every FROZEN param leaf before the
    forward pass. The optax mask already zeroes their updates, so numerics
    are identical — but making the grads structurally zero lets XLA
    dead-code-eliminate the frozen encoder/proposal/density backward, which
    the reference gets for free from requires_grad=False
    (model_wrapper.py:75-85)."""
    if mode != "action":
        return params
    labels = trainable_mask(params, mode, action_decoder_cfg)
    return jax.tree.map(
        lambda p, l: p if l == "trainable" else jax.lax.stop_gradient(p),
        params, labels,
    )


def make_train_step(model: Model, cfg: TrainCfg, donate: bool = True,
                    static_updated: "Optional[bool]" = None):
    """Build the jitted train step: (state, raw_batch, key) -> (state, metrics).

    The returned fn is SPMD-ready: pass batch leaves sharded over a mesh
    "data" axis and replicated params; XLA inserts the grad all-reduces.

    `static_updated`: bake the proposal-update gate (ray_samplers.py:536-544)
    into the compiled program instead of tracing it. The train loop compiles
    BOTH variants and dispatches per step via `host_step_schedule` — after
    warmup only every `proposal_update_every`-th step pays the proposal
    backward (reference semantics exactly; the traced default multiplies
    that backward by zero instead of deleting it).
    """
    rendering_cfg = model.cfg.rendering
    mode = cfg.mode

    def step_fn(state: TrainState, batch: RawBatch, key: jax.Array):
        k_prep, k_samp = jax.random.split(key)
        anneal, updated, new_ssu = step_schedules(
            state.step, state.steps_since_update, rendering_cfg
        )
        if static_updated is not None:
            updated = static_updated
            new_ssu = (jnp.asarray(1, jnp.int32) if static_updated
                       else state.steps_since_update + 1)
        mi, mt = prepare_training_batch(k_prep, batch, cfg.rays_per_batch, mode=mode)
        ctx = StepCtx(key=k_samp, anneal=anneal, updated=updated)

        def loss_fn(params):
            variables = {"params": stop_frozen_gradients(
                params, mode, model.cfg.action_decoder)}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                out, updates = model.apply(variables, mi, ctx, train=True,
                                           mutable=["batch_stats"])
            else:
                out = model.apply(variables, mi, ctx, train=True)
                updates = {}
            if mode == "perception":
                loss, metrics = perception_loss(out, mt, cfg.loss)
            else:
                loss, metrics = action_loss(out, mt, cfg.loss)
            if cfg.log_sanity:
                from ..utils.logging import get_sanity_metrics_traced

                # inputs, targets AND model outputs (model_wrapper.py:164-172)
                metrics = {**metrics,
                           **{f"sanity/input_{k}": v for k, v in
                              get_sanity_metrics_traced(mi).items()},
                           **{f"sanity/target_{k}": v for k, v in
                              get_sanity_metrics_traced(mt).items()},
                           **{f"sanity/output_{k}": v for k, v in
                              get_sanity_metrics_traced(out).items()}}
            return loss, (metrics, updates.get("batch_stats"))

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # Built at trace time: multi_transform labels depend only on the
        # param-tree STRUCTURE, which is static under jit.
        tx = make_optimizer(cfg, state.params, model.cfg.action_decoder)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if state.batch_stats is not None else None,
            opt_state=new_opt_state,
            steps_since_update=new_ssu,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_multi_train_step(model: Model, cfg: TrainCfg, steps_per_call: int,
                          donate: bool = True,
                          static_schedule: "Optional[Tuple[bool, ...]]" = None):
    """K train steps per device dispatch: (state, stacked_batch, key) ->
    (state, stacked metrics [K]).

    `stacked_batch` leaves carry a leading [K] axis (see `stack_batches`).
    The K steps run as one compiled program — on dispatch-latency-bound
    setups (remote-TPU tunnels; tiny models) this amortizes the per-call
    round trip by K. Semantically identical to K sequential
    `make_train_step` calls with the split keys.

    `static_schedule`: a length-K tuple of proposal-gate values to BAKE into
    the program (see make_train_step's `static_updated`), so XLA deletes the
    proposal backward on the frozen substeps. Consecutive equal gates are
    compiled as ONE `lax.scan` run (r5): a window like (F,F,F,F,F,T) lowers
    to a 5-iteration scan over the frozen body + one inline update substep —
    program size (and cold-compile time) stays ~2 substeps regardless of K,
    while keeping the full DCE. At steady state the gate pattern is
    periodic with period proposal_update_every+1; which ROTATION of it a
    dispatch window sees depends on where the warmup schedule left the ssu
    counter, so the train loop discovers the recurring tuples at runtime
    (`MultiStepDispatch`) and keeps the traced-scan variant for warmup
    windows.
    """
    rendering_cfg = model.cfg.rendering
    mode = cfg.mode

    def substep(st: TrainState, batch: RawBatch, k: jax.Array,
                static_updated: "Optional[bool]"):
        k_prep, k_samp = jax.random.split(k)
        anneal, updated, new_ssu = step_schedules(
            st.step, st.steps_since_update, rendering_cfg
        )
        if static_updated is not None:
            updated = static_updated
            new_ssu = (jnp.asarray(1, jnp.int32) if static_updated
                       else st.steps_since_update + 1)
        mi, mt = prepare_training_batch(k_prep, batch, cfg.rays_per_batch,
                                        mode=mode)
        ctx = StepCtx(key=k_samp, anneal=anneal, updated=updated)

        def loss_fn(params):
            variables = {"params": stop_frozen_gradients(
                params, mode, model.cfg.action_decoder)}
            if st.batch_stats is not None:
                variables["batch_stats"] = st.batch_stats
                out, upd = model.apply(variables, mi, ctx, train=True,
                                       mutable=["batch_stats"])
            else:
                out = model.apply(variables, mi, ctx, train=True)
                upd = {}
            if mode == "perception":
                loss, metrics = perception_loss(out, mt, cfg.loss)
            else:
                loss, metrics = action_loss(out, mt, cfg.loss)
            return loss, (metrics, upd.get("batch_stats"))

        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        tx = make_optimizer(cfg, st.params, model.cfg.action_decoder)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_state = TrainState(
            step=st.step + 1,
            params=optax.apply_updates(st.params, updates),
            batch_stats=new_bs if st.batch_stats is not None else None,
            opt_state=new_opt,
            steps_since_update=new_ssu,
        )
        return new_state, metrics

    if static_schedule is not None:
        assert len(static_schedule) == steps_per_call
        # compress consecutive equal gates into (gate, count) runs — each
        # multi-step run lowers to one lax.scan (bounded program size)
        runs = []
        for g in static_schedule:
            if runs and runs[-1][0] == bool(g):
                runs[-1][1] += 1
            else:
                runs.append([bool(g), 1])

        def multi_step_fn(state: TrainState, stacked_batch: RawBatch,
                          key: jax.Array):
            keys = jax.random.split(key, steps_per_call)
            ms = []
            i = 0
            for gate, cnt in runs:
                if cnt == 1:
                    batch_i = jax.tree.map(
                        lambda x: None if x is None else x[i], stacked_batch,
                        is_leaf=lambda x: x is None)
                    state, m = substep(state, batch_i, keys[i], gate)
                    ms.append(jax.tree.map(lambda v: jnp.stack([v]), m))
                else:
                    window = jax.tree.map(
                        lambda x: None if x is None else x[i:i + cnt],
                        stacked_batch, is_leaf=lambda x: x is None)

                    def body(carry, xs, _gate=gate):
                        batch, k = xs
                        return substep(carry, batch, k, _gate)

                    state, m = jax.lax.scan(body, state,
                                            (window, keys[i:i + cnt]))
                    ms.append(m)
                i += cnt
            return state, jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *ms)
    else:
        def multi_step_fn(state: TrainState, stacked_batch: RawBatch,
                          key: jax.Array):
            keys = jax.random.split(key, steps_per_call)

            def body(carry, xs):
                batch, k = xs
                return substep(carry, batch, k, None)

            return jax.lax.scan(body, state, (stacked_batch, keys))

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_step_fn, donate_argnums=donate_argnums)


class MultiStepDispatch:
    """Pick the program for each steps_per_call>1 dispatch window.

    The steady-state proposal-gate cycle — update_every frozen steps + 1
    update (ray_samplers.py:513-515) — settles into a FIXED rotation whose
    phase depends on where the warmup schedule left the ssu counter. That
    phase is not knowable at build time: precompiling one assumed rotation
    can produce a program that never matches any window (when steps_per_call
    tiles the cycle, the window-to-cycle phase is frozen forever), silently
    losing the proposal-backward DCE. So instead: once the window is fully
    past `warmup` (where the update schedule saturates and the rotation
    freezes — the schedule also recurs DURING warmup, but in many distinct
    period-2..period-cycle tuples not worth a compile each), compile a
    statically-gated program for each gate tuple on second sight: exactly
    one tuple recurs when steps_per_call tiles the cycle, and up to
    cycle/gcd(spc, cycle) rotations otherwise — capped by `max_programs`.
    """

    def __init__(self, build_fn, warmup: int = 0, max_programs: int = 4):
        self._build = build_fn  # gate tuple -> compiled program
        self._programs = {}
        self._seen = {}
        self._cap_logged = set()
        # host_step_schedule forces updated=True while step < 10 regardless
        # of the warmup schedule; with proposal_warmup < 10 (toy/test
        # configs) those transient all-True tuples would otherwise recur
        # past `warmup` and burn compile slots (r3 advisor finding)
        self.warmup = max(warmup, 10)
        self.max_programs = max_programs

    def select(self, step, gates, default):
        """step: the window's first global step; gates: its
        host_step_schedule values. Returns the statically-gated program for
        recurring post-warmup tuples, else `default`."""
        if step < self.warmup:
            return default
        gt = tuple(bool(g) for g in gates)
        fn = self._programs.get(gt)
        if fn is not None:
            return fn
        n = self._seen.get(gt, 0) + 1
        self._seen[gt] = n
        if n >= 2:
            if len(self._programs) < self.max_programs:
                fn = self._build(gt)
                self._programs[gt] = fn
                return fn
            if gt not in self._cap_logged:
                self._cap_logged.add(gt)
                print(f"MultiStepDispatch: max_programs={self.max_programs} "
                      f"reached; recurring gate tuple {gt} stays on the "
                      "traced scan (correct but loses the proposal-backward "
                      "DCE)", flush=True)
        return default


def stack_batches(batches):
    """Stack K RawBatches along a new leading axis for make_multi_train_step."""
    import numpy as np

    def stack(*leaves):
        if leaves[0] is None:
            return None
        return np.stack([np.asarray(x) for x in leaves], axis=0)

    return jax.tree.map(stack, *batches, is_leaf=lambda x: x is None)
