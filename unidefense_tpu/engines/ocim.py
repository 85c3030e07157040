"""OCIMEngine — cross-domain face-anti-spoofing (O/C/I/M protocol).

Parity target: engine/ocim_engine.py. Per-source-domain real/fake stream
pairs (even index = real, odd = fake, :245-252), random face-crop margin for
training ((0.0, 0.5)) and fixed 0.3 for val (:84-85), video-level validation
with threshold='auto' (EER), best checkpoint by max(AUC - HTER) (:393-397).
"""

from __future__ import annotations


import jax
import numpy as np

from unidefense_tpu.config import load_dataset_config
from unidefense_tpu.data.datasets import OCIMDataset, OCIMSubDataset
from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher
from unidefense_tpu.engines.base import AbstractEngine
from unidefense_tpu.utils.meters import DeviceMetricAccumulator, Timer
from unidefense_tpu.utils.metrics import cal_metrics


class OCIMEngine(AbstractEngine):
    engine_name = "OCIM"
    plateau_default_mode = "max"  # feeds AUC - HTER (higher is better)

    def _initiated_settings(self, model_cfg, data_cfg, config_cfg):
        pass

    def _train_settings(self, model_cfg, data_cfg, config_cfg):
        options = load_dataset_config(self.config)
        self._mprint(f"Using debug mode: {self.debug}.")

        self.train_set = OCIMDataset(options, split="train")
        self.num_train_domains = self.train_set.num_domains

        val_options = dict(options)
        val_options["test_dataset"] = options.get("test_dataset")[0]
        self.val_set = OCIMSubDataset(val_options, "test", "both")

        self.train_margin = tuple(config_cfg.get("train_margin", (0.0, 0.5)))
        self.val_margin = float(config_cfg.get("val_margin", 0.3))
        self.num_steps = options["num_steps"]
        self.log_steps = options["log_steps"]
        self.val_steps = options["val_steps"]
        self.crop = config_cfg.get("crop", "4p")
        self._mprint(f"crop: {self.crop}")
        self._setup_run_dir(options)

        bs = data_cfg["train_batch_size"]
        shard = (jax.process_index(), jax.process_count())
        self.batchers = []
        for sub in self.train_set.datasets:
            # per-PROCESS draw of this domain stream (global need / nproc)
            sampler = EpochSampler(len(sub), self._stream_batch(bs), shuffle=True,
                                   drop_last=True, shard_id=shard[0], num_shards=shard[1])
            self.batchers.append(
                InfiniteBatcher(sub, sampler,
                                load_kwargs={"margin": self.train_margin, "crop": self.crop})
            )
        self.val_batch_size = data_cfg.get("val_batch_size", 64)

        # per-device composition: bs real frames per real-domain, bs fake per
        # fake-domain; real domains first (engine contract)
        n_real_streams = self.num_train_domains
        per_dev_real = bs * n_real_streams
        per_dev_fake = bs * n_real_streams
        h, w = self.train_set.datasets[0].host_tf.height, self.train_set.datasets[0].host_tf.width
        self._build_training(
            (per_dev_real + per_dev_fake, h, w, 3),
            sum_real=per_dev_real,
            sum_fake=per_dev_fake,
            num_steps=self.num_steps,
            device_tf=self.train_set.datasets[0].device_tf,
        )
        self._maybe_resume()

    def _test_settings(self, model_cfg, data_cfg, config_cfg):
        options = load_dataset_config(self.config)
        options["test_dataset"] = options.get("test_dataset")[0] \
            if isinstance(options.get("test_dataset"), list) else options["test_dataset"]
        self.test_set = OCIMSubDataset(options, "test", "both")
        self.test_batch_size = data_cfg.get("test_batch_size", 96)
        self.test_margin = float(config_cfg.get("test_margin", 0.3))
        self.crop = config_cfg.get("crop", "4p")
        self._setup_test_dir(options)
        h, w = self.test_set.host_tf.height, self.test_set.host_tf.width
        self._build_training(
            (self.test_batch_size, h, w, 3), sum_real=1, sum_fake=1, num_steps=1,
            device_tf=self.test_set.device_tf, train=False,
        )
        from unidefense_tpu.checkpoint import CheckpointManager

        self.ckpt = CheckpointManager(self.run_dir)
        self.state, meta = self.ckpt.restore(self.state, best=True)
        self._mprint(
            f"Loaded best checkpoint: step {meta.get('best_step')}, "
            f"AUC {meta.get('best_auc', -1):.4f}, HTER {meta.get('best_hter', -1):.4f}"
        )

    def _interleave_domains(self, arrs):
        """Each domain stream contributes bs rows to EVERY device's local
        batch (the reference gives each DDP rank all source domains,
        engine/ocim_engine.py:229-255): split each per-domain array into
        per-LOCAL-device chunks and regroup device-major (multihost: the
        arrays hold only this process's rows)."""
        if self.n_dev_local == 1:
            return np.concatenate(arrs, 0)
        chunks = [np.split(a, self.n_dev_local) for a in arrs]
        return np.concatenate(
            [c for d in range(self.n_dev_local) for dom in chunks for c in (dom[d],)], 0
        )

    def _select_batch(self, cur_step: int):
        return [b.select(cur_step) for b in self.batchers]

    def _load_batch(self, sels):
        """Load one batch per domain stream; concat real streams then fake
        streams (engine/ocim_engine.py:229-255)."""
        real_imgs, real_lbls, fake_imgs, fake_lbls = [], [], [], []
        for domain_idx, (batcher, sel) in enumerate(zip(self.batchers, sels)):
            out = batcher.load(sel)
            if domain_idx % 2 == 0:
                real_imgs.append(out["images"])
                real_lbls.append(out["label"])
            else:
                fake_imgs.append(out["images"])
                fake_lbls.append(out["label"])
        return self.assemble_batch(
            self._interleave_domains(real_imgs), self._interleave_domains(real_lbls),
            self._interleave_domains(fake_imgs), self._interleave_domains(fake_lbls),
        )

    def _produce_batch(self, cur_step: int):
        return self._load_batch(self._select_batch(cur_step))

    def train(self):
        timer = Timer()
        # every-step metric/acc accumulation on device (reference updates its
        # meters each step, engine/forgery_engine.py:285-297; host fetch only
        # at log boundaries)
        train_meter = DeviceMetricAccumulator()
        prefetch = self._make_prefetcher()
        rng = jax.random.fold_in(self.base_rng, 54321)
        self._install_preemption_handler()

        cur_step = self.start_step - 1
        try:
            for batch in prefetch:
                cur_step += 1
                self._profile_tick(cur_step)
                self.state, metrics, cls_out = self.train_step(
                    self.state, batch, jax.random.fold_in(rng, cur_step)
                )
                train_meter.update(metrics, cls_out, batch["label"])
                if cur_step % self.log_steps == 0 or cur_step % self.val_steps == 0:
                    snap = train_meter.snapshot()
                    iter_acc = snap["acc"]
                    if self.logger is not None and cur_step % self.log_steps == 0:
                        info = {"train/acc": iter_acc,
                                "train/lr": self._printed_lr(cur_step)}
                        info.update({f"train/{k}": v for k, v in snap["means"].items()})
                        self.logger.log(info, cur_step)
                    # running means + LR, same fields as FE: the reference's
                    # OCIM line is format-identical to forgery's
                    # (engine/ocim_engine.py:291-298, AverageMeter .avg)
                    self._mprint(
                        "Train Iter (%d/%d), Loss %.4f, Triplet %.4f, Spat %.4f, Freq %.4f, ACC %.4f, LR %.6f"
                        % (cur_step, self.num_steps,
                           snap["means"].get("total_loss", 0.0),
                           snap["means"].get("triplet_loss", 0.0),
                           snap["means"].get("real_rec_loss", 0.0),
                           snap["means"].get("real_freq_loss", 0.0),
                           iter_acc, self._printed_lr(cur_step))
                    )
                if cur_step % self.val_steps == 0 and not self.debug:
                    self.validate(cur_step, timer)
                if self._graceful_stop(cur_step):
                    break
        finally:
            self._restore_preemption_handler()
        prefetch.close()
        if self.logger is not None:
            self.logger.finish()

    def validate(self, step: int, timer: Timer):
        self.log_recon_figure(
            self.val_set, {"margin": self.val_margin, "crop": self.crop}, step, every=1000
        )
        prob_dict, tgt_dict = self.score_dataset(
            self.val_set, self.val_batch_size,
            {"margin": self.val_margin, "crop": self.crop}, step,
        )
        out = self.gather_eval_output(prob_dict, tgt_dict)
        # VIDEO-level metrics with the EER (auto) threshold
        metrics = cal_metrics(
            np.asarray(out["video_tgt"]), np.asarray(out["video_prob"]), threshold="auto"
        )
        self._mprint(
            f"Eval Step {step}, EER {metrics['EER']:.4f}, HTER {metrics['ACER']:.4f}, "
            f"TPR5% {metrics['TPR5%']:.4f}, AUC {metrics['AUC']:.4f}, "
            f"Thres {metrics['Thre']:.4f}, ACC {metrics['ACC']:.4f}"
        )
        if metrics["AUC"] - metrics["ACER"] > self.best_auc - self.best_hter:
            self.best_auc = metrics["AUC"]
            self.best_hter = metrics["ACER"]
            self.best_step = step
            self._save_ckpt(step, best=True)
        self._mprint(
            "Best Step %d, Best AUC %.4f, Best HTER %.4f, Running Time: %s, Estimated Time: %s"
            % (self.best_step, self.best_auc, self.best_hter,
               timer.measure(), timer.measure(step / self.num_steps))
        )
        self._plateau_step(metrics["AUC"] - metrics["ACER"])
        self._save_ckpt(step, best=False)
        if self.logger is not None:
            self.logger.log(
                {"val/AUC": metrics["AUC"], "val/HTER": metrics["ACER"],
                 "val/TPR@5%": metrics["TPR5%"], "val/best_AUC": self.best_auc,
                 "val/best_HTER": self.best_hter},
                step,
            )

    def test(self):
        prob_dict, tgt_dict = self.score_dataset(
            self.test_set, self.test_batch_size,
            {"margin": self.test_margin, "crop": self.crop}, -1, desc="test",
        )
        out = self.gather_eval_output(prob_dict, tgt_dict)
        metrics = cal_metrics(
            np.asarray(out["video_tgt"]), np.asarray(out["video_prob"]), threshold="auto"
        )
        self._mprint(
            f"Test | EER {metrics['EER']:.4f}, HTER {metrics['ACER']:.4f}, "
            f"TPR 5% {metrics['TPR5%']:.4f}, AUC {metrics['AUC']:.4f}, "
            f"Thres {metrics['Thre']:.8f}, ACC {metrics['ACC']:.4f}\n"
            f"       APCER {metrics['APCER']:.4f}, BPCER {metrics['BPCER']:.4f}\n"
            f"       TP_Ratio {metrics['TP_Ratio']:.4f}, #Pos {metrics['NumP']}, "
            f"TN_Ratio {metrics['TN_Ratio']:.4f}, #Neg {metrics['NumN']}"
        )
        return metrics
