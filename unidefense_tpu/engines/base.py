"""AbstractEngine — shared lifecycle for the three task engines.

Mirrors the responsibilities of engine/abstract_engine.py (settings phases,
seeding, training-step algorithm, eval aggregation, run-dir/logging) with the
TPU-native execution model:

* the two-pass training algorithm lives in train/step.py as ONE jitted
  function (instead of eager train_unidefense_model);
* one process drives all devices through a Mesh('data') + shard_map instead
  of per-rank DDP processes;
* checkpoints carry full TrainState via orbax and actually resume
  (the reference's `resume: True` path raises NotImplementedError,
  engine/forgery_engine.py:211-213).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.checkpoint import CheckpointManager
from unidefense_tpu.models.registry import build_model
from unidefense_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    shard_eval_step,
    shard_train_step,
    split_device_batch,
)
from unidefense_tpu.train.optim import build_optimizer
from unidefense_tpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from unidefense_tpu.utils.logging import TrainLogger
from unidefense_tpu.utils.meters import Logger, Timer, center_print
from unidefense_tpu.utils.metrics import merge_video_dicts


class AbstractEngine:
    engine_name = "Abstract"
    # direction of the metric this engine feeds ReduceLROnPlateau
    # (torch default is 'min'; engines whose selection metric is
    # higher-is-better override with 'max')
    plateau_default_mode = "min"

    def __init__(self, config: dict, stage: str = "Train"):
        if stage not in ("Train", "Test"):
            raise ValueError(f"stage should be 'Train' or 'Test', got '{stage}'")
        self.config = config
        self.stage = stage
        model_cfg = dict(config.get("model") or {})
        data_cfg = dict(config.get("data") or {})
        config_cfg = dict(config.get("config") or {})

        self.model_name = model_cfg.pop("name", None)
        self.model_cfg = model_cfg
        self.data_cfg = data_cfg
        self.config_cfg = config_cfg
        self.dataset_config: Optional[dict] = None

        self.debug = bool(config_cfg.get("debug", False))
        self.offline = bool(config_cfg.get("offline", False))
        self.local_rank = int(config_cfg.get("local_rank", 0) or 0)
        self.precision = str(config_cfg.get("precision", "fp32"))
        self.compute_dtype = jnp.bfloat16 if self.precision == "bf16" else None

        self.num_devices = config_cfg.get("num_devices")
        self.mesh = create_mesh(self.num_devices)
        self.n_dev = self.mesh.devices.size
        self.n_dev_local = len(self.mesh.local_devices)
        self.multi_device = self.n_dev > 1

        self.best_acc = 0.0
        self.best_auc = 0.0
        self.best_hter = 1.0e8
        self.best_step = 1
        self.start_step = 1

        self.run_dir: Optional[str] = None
        self.logger: Optional[TrainLogger] = None
        self.ckpt: Optional[CheckpointManager] = None
        self.base_rng = self.fixed_randomness()

        self._initiated_settings(model_cfg, data_cfg, config_cfg)
        if stage == "Train":
            self._train_settings(model_cfg, data_cfg, config_cfg)
        else:
            self._test_settings(model_cfg, data_cfg, config_cfg)

    # ------------------------------------------------------------------ setup

    @staticmethod
    def fixed_randomness(seed: int = 42) -> jax.Array:
        """Single explicit PRNG root instead of global seeds
        (engine/abstract_engine.py:113-120 seeds everything with 42)."""
        return jax.random.PRNGKey(seed)

    def _mprint(self, content: str = ""):
        if jax.process_index() == 0:
            print(content)

    def _initiated_settings(self, model_cfg, data_cfg, config_cfg):
        raise NotImplementedError

    def _train_settings(self, model_cfg, data_cfg, config_cfg):
        raise NotImplementedError

    def _test_settings(self, model_cfg, data_cfg, config_cfg):
        raise NotImplementedError

    def _setup_run_dir(self, options: dict):
        """Create runs/<model>/<id>/, tee stdout, init logging
        (engine/forgery_engine.py:102-125)."""
        if self.debug:
            return
        run_id = self.config_cfg.get(
            "id", time.strftime("%Y-%m-%d...%H.%M.%S", time.localtime())
        )
        self.run_id = run_id
        self.run_dir = os.path.join("runs", self.model_name, run_id)
        resume = bool(self.config_cfg.get("resume", False))
        if jax.process_index() == 0:
            if not resume:
                if os.path.exists(self.run_dir):
                    raise ValueError(f"Error: given id '{run_id}' already exists.")
                os.makedirs(self.run_dir, exist_ok=True)
                self.dataset_config = options
            print(f"Logging directory: {self.run_dir}.")
            sys.stdout = Logger(os.path.join(self.run_dir, "records.txt"))
            center_print("Train configurations begin.")
            print({k: v for k, v in self.config.items() if k != "cfg_path"})
            print(options)
            center_print("Train configurations end.")
        if jax.process_index() == 0:
            self._snapshot_sources()
        self.ckpt = CheckpointManager(self.run_dir)
        self.logger = TrainLogger(
            self.run_dir,
            project="UniDefense",
            group=self.engine_name,
            name=f"{self.model_name}/{run_id}",
            config={"model": self.model_cfg, "config": self.config_cfg,
                    "data": self.data_cfg, "dataset": options},
            offline=self.offline,
            enabled=jax.process_index() == 0,
        )

    def _setup_test_dir(self, options: dict):
        """Resolve runs/<model>/<id>/ for Test stage and tee stdout to
        test.txt (engine/forgery_engine.py:185-197: the reference redirects
        test-mode output to `test.txt` in the existing run dir)."""
        self.run_id = self.config_cfg["id"]
        self.run_dir = os.path.join("runs", self.model_name, self.run_id)
        assert os.path.exists(self.run_dir), (
            f"Logging directory '{self.run_dir}' corrupted."
        )
        if jax.process_index() == 0:
            print(f"Logging directory: {self.run_dir}.")
            sys.stdout = Logger(os.path.join(self.run_dir, "test.txt"))
            center_print("Test data configurations begins.")
            print(options)
            center_print("Test data configurations ends.")

    def _snapshot_sources(self):
        """Copy the model/engine source files and the config into the run dir
        for reproducibility (engine/abstract_engine.py:92-97 does this with
        `cp` into the wandb dir)."""
        import inspect
        import shutil

        code_dir = os.path.join(self.run_dir, "code")
        os.makedirs(code_dir, exist_ok=True)
        try:
            from unidefense_tpu.models.registry import load_model

            files = [inspect.getfile(type(self)), inspect.getfile(load_model(self.model_name))]
        except Exception:
            files = [inspect.getfile(type(self))]
        cfg_path = self.config.get("cfg_path")
        if cfg_path and os.path.exists(cfg_path):
            files.append(cfg_path)
        for f in files:
            try:
                shutil.copy(f, code_dir)
            except OSError:
                pass

    def _build_model(self):
        axis_name = DATA_AXIS if self.multi_device else None
        model_cfg = self.model_cfg
        if self.config_cfg.get("deterministic_regularization", False):
            # additive key: zero all stochastic regularization (dropout,
            # feature dropout, EfficientNet drop-connect) for reproducible /
            # cross-framework-comparable runs. The r4 UDEB4 parity isolation
            # (tools/parity_curves.py --deterministic) showed these RNG
            # streams are unalignable across frameworks; this knob gives the
            # engine loop the same switch. tools/ref_cpu_shim.py honors the
            # same YAML key for the reference side.
            model_cfg = dict(model_cfg)
            model_cfg.update(drop_rate=0.0, feat_drop_rate=0.0)
            if self.model_name.upper() == "UDEB4":
                model_cfg["drop_connect_rate"] = 0.0
            self.model_cfg = model_cfg
        self.model = build_model(
            self.model_name, self.model_cfg, axis_name=axis_name,
            dtype=self.compute_dtype, remat=bool(self.config_cfg.get("remat", False)),
        )
        return self.model

    def _build_training(self, sample_shape, sum_real: int, sum_fake: int,
                        num_steps: int, device_tf=None, train: bool = True):
        """Construct state + jitted train/eval steps. sum_real/sum_fake are
        PER-DEVICE counts (the reference's per-rank batch halves).
        train=False (Test stage) skips tracing the train step — only the eval
        step is ever called there, and a stray trace costs compile minutes."""
        model = self._build_model()
        params_shapes = jax.eval_shape(
            lambda: model.init(
                {"params": self.base_rng, "dropout": self.base_rng},
                jnp.zeros(sample_shape, jnp.float32),
                train=False,
            )
        )
        self.tx, self.lr_schedule = build_optimizer(self.config_cfg, params_shapes["params"])
        from unidefense_tpu.train.optim import build_plateau

        # metric-fed LR decay (scheduler name ReduceLROnPlateau); engines feed
        # their best-model selection metric each validation. The default mode
        # follows the metric's direction per engine (FE/OCIM feed
        # higher-is-better AUC composites -> 'max'; UE feeds ACER -> 'min');
        # an explicit scheduler.mode in the YAML still wins.
        self.plateau = build_plateau(
            self.config_cfg, default_mode=self.plateau_default_mode
        )
        sample_x = jnp.zeros(sample_shape, jnp.float32)
        self.state = create_train_state(model, self.tx, self.base_rng, sample_x)
        if self.plateau is not None:
            # lr_scale goes live at step 1 so the first validation's update
            # does not change the step's pytree structure (no recompile)
            self.state = self.state.replace(lr_scale=jnp.float32(self.plateau.scale))

        # pretrained backbone weights (reference 'extractor_weights' key,
        # config_template/forgery/model_udeb4.yml:6): torch .pth -> flax
        weights_path = self.model_cfg.get("extractor_weights")
        if weights_path and os.path.exists(weights_path):
            from unidefense_tpu.models.convert import load_pretrained_extractor

            variables = {"params": jax.device_get(self.state.params),
                         "batch_stats": jax.device_get(self.state.batch_stats)}
            variables = load_pretrained_extractor(variables, weights_path, self.model_name)
            self.state = self.state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
            self._mprint(f"Loaded pretrained extractor weights from {weights_path}.")
        elif weights_path:
            self._mprint(f"WARNING: extractor_weights '{weights_path}' not found; "
                         "training from scratch.")

        # full-model warm start (additive 'init_weights' config key): a
        # reference-format {'model': state_dict} torch checkpoint converted
        # through the models/convert bridge. Used for warm-starting from a
        # released reference checkpoint and by tools/engine_ab.py --same-init
        # to seed both A/B sides from identical weights. Loaded AFTER
        # extractor_weights (a full-model init supersedes a backbone-only
        # one); a later resume/checkpoint restore still supersedes this.
        init_path = self.config_cfg.get("init_weights")
        if init_path:
            if not os.path.exists(init_path):
                raise FileNotFoundError(
                    f"config.init_weights '{init_path}' does not exist")
            from unidefense_tpu.models.convert import load_unidefense_checkpoint

            variables = {"params": jax.device_get(self.state.params),
                         "batch_stats": jax.device_get(self.state.batch_stats)}
            variables = load_unidefense_checkpoint(variables, init_path)
            self.state = self.state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
            self._mprint(f"Initialized full model weights from {init_path}.")

        eval_fn = make_eval_step(model, preprocess=device_tf)
        self._eval_fn = eval_fn  # raw fn for the process-local eval path
        self._local_eval_cached = None
        if train:
            step_fn = make_train_step(
                model,
                self.tx,
                self.config_cfg,
                num_steps=num_steps,
                sum_real=sum_real,
                sum_fake=sum_fake,
                faithful_grad_accumulation=bool(
                    self.config_cfg.get("faithful_grad_accumulation", True)
                ),
                freq_norm=self.model_cfg.get("freq_norm", "ortho"),
                axis_name=DATA_AXIS if self.multi_device else None,
                preprocess=device_tf,
            )
            self.train_step = (
                shard_train_step(step_fn, self.mesh)
                if self.multi_device
                else jax.jit(step_fn, donate_argnums=0)
            )
        self.eval_step = (
            shard_eval_step(eval_fn, self.mesh)
            if self.multi_device
            else jax.jit(eval_fn)
        )
        return model

    def _maybe_resume(self):
        """Real resume: restore full TrainState + best-metric bookkeeping."""
        if not self.config_cfg.get("resume", False) or self.ckpt is None:
            return
        best = bool(self.config_cfg.get("resume_best", False))
        if not self.ckpt.exists(best):
            self._mprint(f"Resume requested but no checkpoint at {self.run_dir}; starting fresh.")
            return
        self.state, meta = self.ckpt.restore(self.state, best=best)
        if self.multi_device:
            # Checkpoints are device-layout-agnostic (saved host-side,
            # checkpoint.py:69); orbax commits restored leaves to the default
            # device, which the N-device shard_map jit rejects. Re-commit the
            # tree replicated over the CURRENT mesh so a run preempted on M
            # devices resumes on N (elastic fleet reshapes).
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self.mesh, PartitionSpec())
            self.state = jax.tree.map(
                lambda x: jax.device_put(x, repl), self.state
            )
        self.best_acc = meta.get("best_acc", self.best_acc)
        self.best_auc = meta.get("best_auc", self.best_auc)
        self.best_hter = meta.get("best_hter", self.best_hter)
        self.best_step = meta.get("best_step", self.best_step)
        self.start_step = int(meta.get("step", 0)) + 1
        if getattr(self, "plateau", None) is not None and "plateau" in meta:
            p = self.plateau
            saved = meta["plateau"]
            p.lr = float(saved.get("lr", p.lr))
            p.best = float(saved.get("best", p.best))
            p.num_bad_epochs = int(saved.get("num_bad_epochs", 0))
            p.cooldown_counter = int(saved.get("cooldown_counter", 0))
        self._mprint(f"Resumed from step {self.start_step - 1} (best={best}).")

    # ---------------------------------------------------------------- helpers

    def _meta(self, step: int) -> dict:
        meta = {
            "step": step,
            "best_step": self.best_step,
            "best_auc": self.best_auc,
            "best_acc": self.best_acc,
            "best_hter": self.best_hter,
        }
        if getattr(self, "plateau", None) is not None:
            p = self.plateau
            meta["plateau"] = {
                "lr": p.lr, "best": p.best, "num_bad_epochs": p.num_bad_epochs,
                "cooldown_counter": p.cooldown_counter,
            }
        return meta

    def _plateau_step(self, metric: float):
        """Feed the validation metric to ReduceLROnPlateau (if configured) and
        inject the resulting LR multiplier into the jitted train step."""
        if getattr(self, "plateau", None) is None:
            return
        scale = self.plateau.step(metric)
        self.state = self.state.replace(lr_scale=jnp.asarray(scale, jnp.float32))

    def _save_ckpt(self, step: int, best: bool = False):
        # collective: every process enters (orbax barriers internally; only
        # the primary host writes — see CheckpointManager.save)
        if self.ckpt is not None:
            self.ckpt.save(self.state, self._meta(step), best=best)

    # ----------------------------------------------------- preemption handling

    def _install_preemption_handler(self):
        """Arm graceful-stop on SIGTERM/SIGINT for the duration of train().

        TPU fleets preempt VMs with SIGTERM plus a grace window; the
        reference has no story here (a signal kills the DDP rank mid-step and
        its `resume: True` path raises NotImplementedError,
        engine/forgery_engine.py:211-213). The handler only sets a flag; the
        train loop finishes the in-flight step, saves the `latest`
        checkpoint via _graceful_stop and returns cleanly, so a restart with
        `resume: true` continues exactly. A second SIGINT falls through to
        the previous handler (Ctrl-C twice still force-quits)."""
        import signal

        self._preempt_requested = False
        self._prev_handlers = {}

        def _handler(signum, frame):
            if self._preempt_requested and signum == signal.SIGINT:
                prev = self._prev_handlers.get(signal.SIGINT)
                if callable(prev):
                    prev(signum, frame)
                return
            self._preempt_requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev_handlers[sig] = signal.signal(sig, _handler)
            except ValueError:
                # signal.signal only works on the main thread; engines driven
                # from worker threads can still set _preempt_requested
                pass

    def _restore_preemption_handler(self):
        import signal

        for sig, prev in getattr(self, "_prev_handlers", {}).items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
        self._prev_handlers = {}

    def _graceful_stop(self, cur_step: int) -> bool:
        """True if training should stop now; saves the latest checkpoint
        first so the run is resumable from exactly this step.

        Multihost: the orbax save is COLLECTIVE, so every process must agree
        on the stop step — local flags are exchanged every
        `config.preempt_sync_steps` steps (default 10; ~1-2 s of training,
        well inside any preemption grace window) and a stop only happens at
        those boundaries, where all processes see the same gathered flags."""
        if jax.process_count() > 1:
            sync_every = max(1, int(self.config_cfg.get("preempt_sync_steps", 10)))
            if cur_step % sync_every:
                return False
            from unidefense_tpu.parallel.mesh import all_gather_objects

            flags = all_gather_objects(bool(getattr(self, "_preempt_requested", False)))
            stop = any(f[0] for f in flags)
        else:
            stop = bool(getattr(self, "_preempt_requested", False))
        if not stop:
            return False
        self._mprint(
            f"Preemption requested — saving latest checkpoint at step {cur_step}; "
            "restart with `resume: true` to continue."
        )
        self._save_ckpt(cur_step, best=False)
        return True

    def _current_lr(self, cur_step: int) -> float:
        """LR actually applied at this step: the count-based schedule times
        the plateau multiplier (TrainState.lr_scale), matching what torch
        would show in param_groups."""
        lr = float(self.lr_schedule(2 * (cur_step - 1)))
        if self.state.lr_scale is not None:
            lr *= float(self.state.lr_scale)
        return lr

    def _printed_lr(self, cur_step: int) -> float:
        """The LR value the reference prints/logs: param_groups are read
        AFTER the step's scheduler.step() (engine/forgery_engine.py:290-298),
        so after warmup the printed value is the NEXT step's lr; during
        warmup (no scheduler.step, forgery_engine.py:269-272 +
        abstract_engine.py:202-203) it is this step's warmup lr. Keeps the
        'Train Iter' line and the train/lr log output-identical to the
        reference's at decay boundaries (engine-A/B pins max_lr_gap 0)."""
        warmup = int(self.config_cfg.get("warmup_step", 0) or 0)
        if warmup and cur_step <= warmup:
            return self._current_lr(cur_step)
        return self._current_lr(cur_step + 1)

    def _profile_tick(self, cur_step: int):
        """Optional jax.profiler capture (SURVEY §5's TPU-rebuild add): set
        config.profile_start_step (and profile_steps, default 5) to write a
        device trace for those steps into <run_dir>/profile/. View with
        tensorboard-profile or xprof. Note: device tracing can stall on
        tunneled/remote TPU runtimes (CLAUDE.md gotcha 10) — verified on CPU
        and standard TPU runtimes; for tunnel setups use
        tools/profile_step.py ablations instead."""
        start = self.config_cfg.get("profile_start_step")
        if start is None or self.run_dir is None or jax.process_index() != 0:
            return
        start = int(start)
        n = max(1, int(self.config_cfg.get("profile_steps", 5)))
        stop_at = min(start + n, getattr(self, "num_steps", start + n))
        if cur_step == start and start < stop_at:
            self._trace_dir = os.path.join(self.run_dir, "profile")
            jax.profiler.start_trace(self._trace_dir)
            self._trace_open = True
        elif getattr(self, "_trace_open", False) and cur_step >= stop_at:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._trace_open = False
            self._mprint(f"Profiler trace written to {self._trace_dir}")

    def _make_prefetcher(self):
        """Decode-ahead training input pipeline: selection serial (sampler
        determinism), decode on `data.num_workers` threads (default 2; set 1
        to reproduce the reference's synchronous in-loop decode order).
        On resume, batcher state is fast-forwarded so the data stream
        continues exactly where an uninterrupted run would be."""
        from unidefense_tpu.data.pipeline import BatchPrefetcher

        if self.start_step > 1:
            for b in self._batchers():
                b.fast_forward(self.start_step)
        workers = int(self.data_cfg.get("num_workers", 2) or 1)
        # max(1,.) not `or 2`: an explicit prefetch_depth: 0 means "minimum
        # decode-ahead", which is depth 1 (BatchPrefetcher's own clamp);
        # only a null/missing key falls back to the default 2
        raw_depth = self.data_cfg.get("prefetch_depth", 2)
        depth = max(1, int(2 if raw_depth is None else raw_depth))
        return BatchPrefetcher(
            select=self._select_batch, load=self._load_batch, depth=depth,
            num_steps=self.num_steps, start_step=self.start_step, workers=workers,
        )

    def _batchers(self) -> list:
        """The engine's training InfiniteBatchers (for resume fast-forward)."""
        if hasattr(self, "batchers"):
            return list(self.batchers)
        out = []
        for name in ("real_batcher", "fake_batcher"):
            if hasattr(self, name):
                out.append(getattr(self, name))
        return out

    def _stream_batch(self, per_dev: int) -> int:
        """Per-PROCESS draw for a training stream whose global per-step need
        is per_dev × n_dev samples. DistributedSampler parity: each process
        loads exactly the rows its LOCAL devices consume (round-2 bug: the
        engines drew the full GLOBAL batch per process, so under
        process_count > 1 half the decoded samples were silently dropped and
        per-epoch coverage broke)."""
        total = per_dev * self.n_dev
        nproc = jax.process_count()
        if total % nproc:
            raise ValueError(
                f"global stream batch {total} not divisible by {nproc} processes"
            )
        return total // nproc

    def assemble_batch(self, images_real, labels_real, images_fake, labels_fake):
        """Batch with the per-device real-first layout
        (parallel/mesh.split_device_batch). Inputs are this PROCESS's rows;
        multihost: the global array is formed from the per-process shards
        (jax.make_array_from_process_local_data), so the jitted step sees one
        global batch whose addressable rows are exactly what this process
        decoded."""
        if self.n_dev_local > 1:
            imgs, lbls = split_device_batch(
                images_real, labels_real, images_fake, labels_fake,
                self.n_dev_local,
            )
        else:
            imgs = np.concatenate([images_real, images_fake], axis=0)
            lbls = np.concatenate([labels_real, labels_fake], axis=0)
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P(DATA_AXIS))
            return {
                "image": jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(imgs)),
                "label": jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(lbls)),
            }
        return {"image": jnp.asarray(imgs), "label": jnp.asarray(lbls)}

    def _local_eval_step(self):
        """Eval step that involves ONLY this process's devices. Single
        process: the global eval step. Multihost: a fresh jit over a
        process-local mesh — eval has no collectives, and the striped
        score_dataset / recon-figure paths must not enter a cross-host
        rendezvous from one process (deadlock)."""
        if self._local_eval_cached is None:
            if jax.process_count() > 1:
                from jax.sharding import Mesh

                local_mesh = Mesh(
                    np.asarray(self.mesh.local_devices), (DATA_AXIS,)
                )
                self._local_eval_cached = shard_eval_step(self._eval_fn, local_mesh)
            else:
                self._local_eval_cached = self.eval_step
        return self._local_eval_cached

    def score_dataset(self, dataset, batch_size: int, load_kwargs: dict, step: int,
                      desc: str = "val") -> tuple[dict, dict]:
        """Score a whole split with fixed-shape batches (last batch padded by
        repetition so the jitted eval step never recompiles), grouping frame
        probabilities by video (engine/forgery_engine.py:336-360).

        Multihost: each process scores the stripe i ≡ process_index (mod
        process_count) with a process-LOCAL eval step; gather_eval_output
        merges the disjoint per-process dicts — the same
        eval-shard-then-all_gather_object topology as the reference's DDP
        validation (engine/forgery_engine.py:336-375)."""
        pid, nproc = jax.process_index(), jax.process_count()
        n_eval_dev = self.n_dev_local if nproc > 1 else self.n_dev
        if n_eval_dev > 1 and batch_size % n_eval_dev != 0:
            batch_size = -(-batch_size // n_eval_dev) * n_eval_dev  # round up
        stripe = list(range(pid, len(dataset), nproc))
        n = len(stripe)
        prob_dict: dict[str, list] = {}
        tgt_dict: dict[str, list] = {}
        eval_rng = jax.random.fold_in(self.base_rng, 777)
        num_batches = -(-n // batch_size)
        eval_step = self._local_eval_step()

        def _select(b):
            idx = [stripe[i] for i in range(b * batch_size,
                                            min(n, (b + 1) * batch_size))]
            n_valid = len(idx)
            while len(idx) < batch_size:
                idx.append(idx[-1])
            items = [dataset[i][0] for i in idx]
            labels = np.asarray([int(dataset[i][1]) for i in idx], np.int64)
            return items, labels, n_valid

        def _load(sel):
            items, labels, n_valid = sel
            out = dataset.load_item(items, labels, **load_kwargs)
            return out, labels, n_valid

        # decode batch b+1..b+lookahead on worker threads while the chip
        # scores batch b (the reference decodes serially inline,
        # engine/forgery_engine.py:336-360 — a visible stall every val_steps)
        from concurrent.futures import ThreadPoolExecutor

        lookahead = 2
        pool = ThreadPoolExecutor(max_workers=2)
        futs = {b: pool.submit(_load, _select(b)) for b in range(min(lookahead, num_batches))}
        try:
            for b in range(num_batches):
                out, labels, n_valid = futs.pop(b).result()
                nb = b + lookahead
                if nb < num_batches:
                    futs[nb] = pool.submit(_load, _select(nb))
                probs, _, _ = eval_step(
                    self.state.params, self.state.batch_stats,
                    jnp.asarray(out["images"]), jax.random.fold_in(eval_rng, b),
                )
                probs = np.asarray(probs)[:n_valid]
                for p, pr, tg in zip(out["path"][:n_valid], probs, labels[:n_valid]):
                    vid = p.rsplit("/", 1)[0]
                    prob_dict.setdefault(vid, []).append(float(pr))
                    tgt_dict.setdefault(vid, []).append(float(tg))
                if b % 50 == 0:
                    self._mprint(f"Eval {desc} ({b + 1}/{num_batches}), Global Step {step}")
        finally:
            pool.shutdown(wait=False)
        return prob_dict, tgt_dict

    def log_recon_figure(self, dataset, load_kwargs: dict, step: int, every: int = 10000):
        """Save a recon-vs-input grid to the run dir every `every` steps
        (engine/abstract_engine.py:103-106 + forgery_engine.py:379-386 log the
        same figure to wandb every 10k steps; OCIM every 1k)."""
        if (
            self.run_dir is None
            or step % every != 0
            or jax.process_index() != 0
            or len(dataset) < 4
        ):
            return
        from unidefense_tpu.utils.visualize import plot_recon_figure

        idx = list(range(4))
        items = [dataset[i][0] for i in idx]
        labels = [int(dataset[i][1]) for i in idx]
        out = dataset.load_item(items, labels, **load_kwargs)
        imgs = jnp.asarray(out["images"])
        # process-local eval: this figure renders on process 0 only, so a
        # global eval step would deadlock in multihost
        _, cls_out, rec = self._local_eval_step()(
            self.state.params, self.state.batch_stats, imgs, self.base_rng
        )
        inputs = np.asarray(imgs, np.float32) / 255.0
        recs = np.asarray(rec, np.float32)
        fig = plot_recon_figure(
            list(inputs) + list(recs), ("input", "recon"),
            np.asarray(cls_out), labels, categories=dataset.categories,
        )
        fig_path = os.path.join(self.run_dir, f"recon_step{step}.png")
        try:
            fig.savefig(fig_path)
            if self.logger is not None:
                self.logger.log_image("figure/recon", fig, step)
        except Exception:
            pass
        finally:
            import matplotlib.pyplot as plt

            plt.close(fig)

    @staticmethod
    def gather_eval_output(prob_dict: dict, tgt_dict: dict) -> dict:
        """Merge + aggregate to frame/video lists. One process already sees
        all local devices' outputs (SPMD); across hosts the per-process video
        dicts are gathered like dist.all_gather_object
        (engine/forgery_engine.py:373-390)."""
        from unidefense_tpu.parallel.mesh import all_gather_objects

        gathered = all_gather_objects(prob_dict, tgt_dict)
        return merge_video_dicts([g[0] for g in gathered], [g[1] for g in gathered])

    def train(self):
        raise NotImplementedError

    def validate(self, step: int, timer: Timer):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError
