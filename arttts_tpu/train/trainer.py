"""Config-driven trainer: the TPU equivalent of the reference's
`train*.py` scripts (`/root/reference/src/train.py:72-333`,
`train_v1_1_dist.py`).

One Trainer covers all experiment versions: the preset selects dataset,
model family, and loss. The epoch loop stays on host; each step is one
jitted SPMD program (mesh DP replaces `mp.spawn` + NCCL DDP). Per epoch:
scalar TB logging, periodic validation + fixed-batch synthesis images
(`train.py:289-333`), early stopping, and `grad_{epoch}` / `grad_best`
checkpoints that — unlike the reference — include optimizer state
(SURVEY.md §5.4).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from arttts_tpu.core.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from arttts_tpu.core.config import ExperimentConfig
from arttts_tpu.data.batching import DataLoader
from arttts_tpu.infer.sampler import synthesize
from arttts_tpu.models.tts import GradTTSModel
from arttts_tpu.ops.shape import fix_len_compatibility
from arttts_tpu.parallel.mesh import assemble_global_batch, make_mesh, replicate
from arttts_tpu.train.losses import loss_for_model
from arttts_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_multistep,
    make_train_step,
)
from arttts_tpu.utils.early_stopping import EarlyStopping

log = logging.getLogger("arttts_tpu.train")


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        train_dataset,
        valid_dataset=None,
        mesh=None,
        use_mesh: bool = False,
        log_dir: Optional[str] = None,
        tb_writer=None,
        host_id: int = 0,
        num_hosts: int = 1,
        language_upsample=None,
    ):
        self.config = config
        self.model = GradTTSModel(config=config.model)
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        self.log_dir = Path(log_dir or config.train.log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.tb = tb_writer
        if self.tb is None:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.log_dir))
            except Exception:  # headless/test environments
                self.tb = None

        t = config.train
        self.num_hosts = num_hosts
        self.train_loader = DataLoader(
            train_dataset,
            batch_size=t.batch_size,
            seed=t.random_seed,
            min_frames=t.out_size,
            host_id=host_id,
            num_hosts=num_hosts,
            language_upsample=language_upsample,
            # multi-host: fixed pad shapes so every host agrees (batching.py)
            text_bucket=config.data.max_text_len if num_hosts > 1 else None,
            frame_bucket=config.data.max_frame_len if num_hosts > 1 else None,
        )
        self.valid_loader = (
            DataLoader(
                valid_dataset,
                batch_size=t.batch_size,
                shuffle=False,
                min_frames=t.out_size,
            )
            if valid_dataset is not None
            else None
        )
        self.valid_dataset = valid_dataset

        self.rng = jax.random.PRNGKey(t.random_seed)
        self._build_state(train_dataset)
        loss_fn = loss_for_model(config.model.name)
        self.train_step = make_train_step(
            self.model, out_size=t.out_size, loss_fn=loss_fn, mesh=self.mesh
        )
        self.eval_step = make_eval_step(self.model, loss_fn=loss_fn, mesh=None)
        # K-step fused dispatch (train/step.py:make_train_multistep): stacks
        # K same-bucket batches and scans K optimizer steps in ONE launch,
        # amortizing host dispatch overhead. Multi-host stacking would need
        # global-array restitching, so it stays single-process.
        k_md = int(getattr(t, "steps_per_dispatch", 1) or 1)
        if k_md > 1 and num_hosts > 1:
            log.warning(
                "steps_per_dispatch=%d ignored with %d hosts "
                "(multistep stacking is single-process)", k_md, num_hosts
            )
            k_md = 1
        self.steps_per_dispatch = k_md
        self.train_multistep = (
            make_train_multistep(
                self.model, out_size=t.out_size, n_steps=k_md,
                loss_fn=loss_fn, mesh=self.mesh,
            )
            if k_md > 1
            else None
        )
        self.early_stopping = EarlyStopping(patience=t.patience, step_size=t.save_every)
        self.start_epoch = 1

    # ------------------------------------------------------------------
    def _build_state(self, dataset):
        item = dataset[0]
        x = np.asarray(item["x"])[None]
        y = np.asarray(item["y"])[None].astype(np.float32)
        # U-Net needs the frame axis divisible by 2^num_downsamplings
        T_pad = fix_len_compatibility(y.shape[1])
        y = np.pad(y, ((0, 0), (0, T_pad - y.shape[1]), (0, 0)))
        key, self.rng = jax.random.split(self.rng)
        spk = (
            jnp.asarray(np.asarray(item["spk"])[None]) if "spk" in item else None
        )
        variables = jax.jit(self.model.init)(
            {"params": key, "dropout": key},
            jnp.asarray(x),
            jnp.array([x.shape[1]], jnp.int32),
            jnp.asarray(y),
            jnp.ones((1, y.shape[1], 1)),
            jnp.zeros((1,)),
            spk,
        )
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        log.info("Total parameters: %.2fm", n_params / 1e6)
        self.state = create_train_state(
            self.model,
            variables,
            self.config.train.learning_rate,
            self.config.train.grad_clip_norm,
        )
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

    # ------------------------------------------------------------------
    def resume(self, ckpt_path: Optional[str] = None) -> int:
        """Restore params/opt_state/early-stopping; returns start epoch."""
        path = ckpt_path or latest_checkpoint(str(self.log_dir))
        if path is None:
            return 1
        restored = load_checkpoint(
            path, target={"params": self.state.params, "opt_state": self.state.opt_state}
        )
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"]
        )
        if "early_stop" in restored["extra"]:
            self.early_stopping = EarlyStopping.from_state_dict(
                restored["extra"]["early_stop"]
            )
        self.start_epoch = restored["extra"].get("epoch", restored["step"]) + 1
        log.info("Resumed from %s at epoch %d", path, self.start_epoch)
        return self.start_epoch

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        agg: Dict[str, list] = {}
        K = self.steps_per_dispatch
        pending: list = []  # same-bucket batches awaiting a fused dispatch

        def shape_sig(b):
            return tuple(sorted((k, v.shape) for k, v in b.items()))

        def step_single(b):
            key, self.rng = jax.random.split(self.rng)
            self.state, metrics = self.train_step(self.state, key, b)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)

        def flush():
            if not pending:
                return
            if len(pending) == K:
                key, self.rng = jax.random.split(self.rng)
                batches = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pending
                )
                self.state, metrics = self.train_multistep(
                    self.state, key, batches
                )
                for k, v in metrics.items():
                    agg.setdefault(k, []).append(v)  # (K,) per metric
            else:  # epoch tail / bucket change: plain per-step dispatches
                for b in pending:
                    step_single(b)
            pending.clear()

        for batch in self.train_loader:
            if self.mesh is not None:
                batch = assemble_global_batch(self.mesh, batch, self.num_hosts)
            else:
                batch = jax.tree_util.tree_map(jnp.asarray, batch)
            if K <= 1:
                step_single(batch)
                continue
            if pending and shape_sig(batch) != shape_sig(pending[0]):
                flush()  # bucket changed: fused dispatch needs equal shapes
            pending.append(batch)
            if len(pending) == K:
                flush()
        flush()
        # one host sync per epoch (metric leaves are scalars or (K,) arrays)
        out = {
            k: float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(v)) for v in vs]
            )))
            for k, vs in agg.items()
        }
        if self.tb:
            for k, v in out.items():
                self.tb.add_scalar(f"training/{k}", v, epoch)
        return out

    def validate(self, epoch: int) -> Dict[str, float]:
        if self.valid_loader is None:
            return {}
        agg: Dict[str, list] = {}
        for batch in self.valid_loader:
            batch = jax.tree_util.tree_map(jnp.asarray, batch)
            metrics = self.eval_step(self.state, jax.random.PRNGKey(0), batch)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        out = {k: float(np.mean([np.asarray(v) for v in vs])) for k, vs in agg.items()}
        if self.tb:
            for k, v in out.items():
                self.tb.add_scalar(f"validation/{k}", v, epoch)
        return out

    def synthesize_samples(self, epoch: int, n_timesteps: int = 50):
        """Fixed-batch synthesis images (ref train.py:289-333)."""
        if self.valid_dataset is None or self.tb is None:
            return
        from arttts_tpu.utils.plotting import plot_alignment, plot_tensor

        items = self.valid_dataset.sample_test_batch(
            min(self.config.train.test_size, len(self.valid_dataset))
        )
        from arttts_tpu.infer.sampler import frame_bucket

        for i, item in enumerate(items):
            x = np.asarray(item["x"])[None]
            spk = (
                jnp.asarray(np.asarray(item["spk"])[None]) if "spk" in item else None
            )
            durations = (
                jnp.asarray(np.ceil(item["durations"])[None])
                if self.config.model.name == "grad_ttartic" and "durations" in item
                else None
            )
            key, self.rng = jax.random.split(self.rng)
            # bucketed static shape: one jit cache entry per bucket
            max_frames = frame_bucket(
                fix_len_compatibility(max(64, 2 * np.asarray(item["y"]).shape[0]))
            )
            enc, dec, attn, y_len = synthesize(
                self.model,
                {"params": self.state.params},
                key,
                jnp.asarray(x),
                jnp.array([x.shape[1]], jnp.int32),
                n_timesteps=n_timesteps,
                max_frames=int(max_frames),
                spk=spk,
                x_durations=durations,
            )
            L = int(np.asarray(y_len)[0])
            self.tb.add_image(
                f"image_{i}/generated_dec",
                plot_tensor(np.asarray(dec)[0, :L].T),
                global_step=epoch,
                dataformats="HWC",
            )
            self.tb.add_image(
                f"image_{i}/alignment",
                plot_alignment(np.asarray(attn)[0, :, :L]),
                global_step=epoch,
                dataformats="HWC",
            )
            # DTW of synthesis vs ground truth (ref train_v1_1_dist.py:451-458)
            try:
                from arttts_tpu.eval.metrics import normalized_dtw_score

                score, _, _ = normalized_dtw_score(
                    np.asarray(dec)[0, :L], np.asarray(item["y"])
                )
                self.tb.add_scalar(f"validation/dtw_{i}", score, epoch)
            except Exception:
                pass

    # ------------------------------------------------------------------
    def fit(self, n_epochs: Optional[int] = None) -> Dict[str, float]:
        t = self.config.train
        n_epochs = n_epochs or t.n_epochs
        last_metrics: Dict[str, float] = {}
        for epoch in range(self.start_epoch, n_epochs + 1):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch)
            last_metrics = train_metrics
            log.info(
                "epoch %d: loss=%.4f (dur=%.4f prior=%.4f diff=%.4f) %.1fs",
                epoch,
                train_metrics.get("total_loss", float("nan")),
                train_metrics.get("dur_loss", float("nan")),
                train_metrics.get("prior_loss", float("nan")),
                train_metrics.get("diff_loss", float("nan")),
                time.time() - t0,
            )
            with open(self.log_dir / "train.log", "a") as f:
                f.write(f"{epoch}\t{train_metrics}\n")

            if epoch % t.val_every == 0:
                val_metrics = self.validate(epoch)
                with open(self.log_dir / "val.log", "a") as f:
                    f.write(f"{epoch}\t{val_metrics}\n")

            if epoch % t.save_every == 0:
                self.synthesize_samples(epoch)
                # without a validation set validate() is empty — fall back to
                # train metrics so early stopping / grad_best still track
                ref = (
                    val_metrics
                    if epoch % t.val_every == 0 and val_metrics
                    else train_metrics
                )
                losses = [
                    ref.get("prior_loss", float("inf")),
                    ref.get("diff_loss", float("inf")),
                    ref.get("dur_loss", float("inf")),
                    ref.get("total_loss", float("inf")),
                ]
                counter, improved = self.early_stopping.step(losses)
                extra = {
                    "epoch": epoch,
                    "early_stop": self.early_stopping.state_dict(),
                }
                params = jax.device_get(self.state.params)
                opt_state = jax.device_get(self.state.opt_state)
                save_checkpoint(
                    str(self.log_dir), f"grad_{epoch}", params, opt_state, epoch, extra
                )
                if improved:
                    save_checkpoint(
                        str(self.log_dir), "grad_best", params, opt_state, epoch, extra
                    )
                if self.early_stopping.should_stop:
                    log.info("Early stopping at epoch %d", epoch)
                    break
        params = jax.device_get(self.state.params)
        save_checkpoint(
            str(self.log_dir),
            "grad_final",
            params,
            jax.device_get(self.state.opt_state),
            n_epochs,
            {"epoch": n_epochs, "early_stop": self.early_stopping.state_dict()},
        )
        return last_metrics
