"""Training orchestration — host loop around the jitted, mesh-sharded step.

Equivalent of the reference ``LowLightTrainer`` (``src/training/trainer.py:
121-496``) with the same surface: epoch loop, per-epoch validation on EMA
weights, periodic/best/final checkpoints, periodic sample grids, tqdm + optional
W&B logging, checkpoint-resume continuing at epoch+1.

Differences by design (all TPU-motivated):
  * the train step is one donated jit program (forward/backward/clip/AdamW/
    LR/EMA) instead of eager ops with a per-step ``loss.item()`` sync
    (``trainer.py:325``) — host only syncs on the loss at log intervals;
  * mixed precision is bf16 compute (no loss-scaler state: bf16 has fp32's
    exponent range, so GradScaler has no TPU equivalent to carry);
  * checkpoints are Orbax pytrees (see ``checkpoint.py``);
  * PSNR/SSIM are computed during validation (the reference never computes
    quality metrics).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(x, **kwargs):
        return x

try:
    import wandb
    HAS_WANDB = True
except ImportError:
    HAS_WANDB = False
    wandb = None

from ..config import TrainConfig, diffusion_config, to_json
from ..models.diffusion import (LowLightDiffusion, create_model, enhance,
                                denormalize_image)
from ..models.scheduler import LCMSchedule
from ..parallel.mesh import make_mesh, shard_batch
from . import checkpoint as ckpt
from .metrics import psnr, ssim
from .train_state import create_train_state, make_eval_step, make_train_step


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def save_comparison_grid(low: np.ndarray, enhanced: np.ndarray,
                         target: np.ndarray, path: str) -> None:
    """[low | enhanced | target] rows → one PNG
    (``src/training/trainer.py:391-413``).  Inputs NHWC in [-1, 1]."""
    from PIL import Image

    rows = []
    for block in (low, enhanced, target):
        block = np.asarray(denormalize_image(jnp.asarray(block)))
        rows.append(np.concatenate(list(_to_u8(block)), axis=1))
    grid = np.concatenate(rows, axis=0)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(path)


class Trainer:
    """Host-side training driver."""

    def __init__(self, model: LowLightDiffusion, schedule: LCMSchedule,
                 train_loader, val_loader=None,
                 config: Optional[TrainConfig] = None,
                 mesh=None):
        self.config = config or TrainConfig()
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.model = model
        self.schedule = schedule
        self.train_loader = train_loader
        self.val_loader = val_loader
        # mesh: None = auto (largest DP mesh the batch divides), False = off.
        if mesh is False:
            self.mesh = None
        elif mesh is None:
            from ..parallel.mesh import auto_mesh
            self.mesh = (make_mesh(self.config.mesh_shape,
                                   self.config.mesh_axes)
                         if self.config.mesh_shape is not None
                         else auto_mesh(self.config.batch_size))
        else:
            self.mesh = mesh

        rng = jax.random.key(self.config.seed)
        from .train_state import make_optimizer
        tx, self.lr_schedule = make_optimizer(self.config, len(train_loader))
        self.state = create_train_state(model, self.config, rng,
                                        steps_per_epoch=len(train_loader),
                                        tx=tx)
        if self.config.init_params_from:
            # Fine-tuning warm start: params (+ EMA copy) from an existing
            # checkpoint, fresh optimizer/LR/epoch (unlike resume).
            like = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype), self.state.params)
            loaded = ckpt.load_inference_params(
                self.config.init_params_from, like,
                use_ema=self.config.init_params_ema)
            # jitted re-init keeps opt_state/EMA consistent with the loaded
            # weights in one program (no eager per-leaf device ops)
            @jax.jit
            def rebuild(p):
                from .ema import init_ema
                return (tx.init(p),
                        init_ema(p) if self.config.use_ema else None)
            opt_state, ema = rebuild(loaded)
            self.state = self.state.replace(params=loaded,
                                            opt_state=opt_state,
                                            ema_params=ema)
        if self.config.qat or self.config.qat_act:
            from ..export.qat import make_qat_train_step
            self.train_step = make_qat_train_step(model, schedule,
                                                  self.config,
                                                  mesh=self.mesh)
        else:
            self.train_step = make_train_step(model, schedule, self.config,
                                              mesh=self.mesh)
        self.eval_step = make_eval_step(model, schedule, self.config,
                                        mesh=self.mesh)
        self._enhance_cache: Dict[int, Any] = {}

        self.epoch = 0
        self.best_val_loss = float("inf")

        # Multi-host: host-only side effects (sample grids, W&B logging)
        # happen on process 0 only. Checkpoint saves stay on every process
        # (orbax saves of sharded arrays are collective). Single-process
        # runs: process_index() == 0 always.
        self.is_main_process = jax.process_index() == 0

        # Async checkpoint saves (single-process only: multi-host orbax
        # saves are collective and stay on the main thread).
        self._saver = (ckpt.AsyncCheckpointSaver()
                       if (self.config.async_checkpoints
                           and jax.process_count() == 1) else None)

        self.output_dir = Path(self.config.output_dir)
        self.checkpoint_dir = Path(self.config.checkpoint_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)

        self.use_wandb = self.config.use_wandb and self.is_main_process
        if self.use_wandb and not HAS_WANDB:
            print("Warning: wandb not installed. Logging disabled.")
            self.use_wandb = False
        if self.use_wandb:
            wandb.init(project=self.config.wandb_project,
                       name=self.config.wandb_run_name,
                       config=json.loads(to_json(self.config)))

        if self.config.resume_from:
            self.load_checkpoint(self.config.resume_from)

    # ------------------------------------------------------------------
    def _device_batch(self, batch: Dict[str, np.ndarray]):
        arrays = {"low_light": batch["low_light"],
                  "normal_light": batch["normal_light"]}
        if self.mesh is not None:
            return shard_batch(self.mesh, arrays)
        return jax.tree_util.tree_map(jnp.asarray, arrays)

    def train(self):
        """Full training loop (``trainer.py:216-267``)."""
        print(f"Starting training on {jax.devices()}")
        for epoch in range(self.epoch, self.config.epochs):
            self.epoch = epoch
            train_loss = self.train_epoch()
            val_loss = self.validate() if self.val_loader is not None else None

            log = {"epoch": epoch, "train_loss": train_loss,
                   "lr": float(self.lr_schedule(int(self.state.step)))}
            msg = f"Epoch {epoch}: train_loss={train_loss:.4f}"
            if val_loss is not None:
                log["val_loss"] = val_loss
                msg += f", val_loss={val_loss:.4f}"
            print(msg)
            if self.use_wandb:
                wandb.log(log)

            # Checkpoint saves run on EVERY process — orbax's save of
            # sharded arrays is collective in multi-host runs (each process
            # writes its shards); gating to process 0 would deadlock.
            if (epoch + 1) % self.config.save_interval == 0:
                self.save_checkpoint(f"checkpoint_epoch_{epoch}")
            if val_loss is not None and val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.save_checkpoint("best_model")
            if (epoch + 1) % self.config.sample_interval == 0:
                if self.is_main_process:
                    self.generate_samples(epoch)

        self.save_checkpoint("final_model")
        self.wait_for_checkpoints()
        if self.use_wandb:
            wandb.finish()

    def train_epoch(self) -> float:
        """One epoch (``trainer.py:269-338``); loss is synced to host only at
        log intervals to keep the device pipeline full."""
        total = 0.0
        count = 0
        pbar = tqdm(self.train_loader, desc=f"Epoch {self.epoch}")
        pending = []
        for batch_idx, batch in enumerate(pbar):
            dev_batch = self._device_batch(batch)
            self.state, metrics = self.train_step(self.state, dev_batch)
            pending.append(metrics["loss"])
            if batch_idx % self.config.log_interval == 0:
                loss_val = float(metrics["loss"])
                if hasattr(pbar, "set_postfix"):
                    pbar.set_postfix({"loss": loss_val})
                if self.use_wandb:
                    step = int(self.state.step)
                    wandb.log({"train_loss_step": loss_val,
                               "lr": float(self.lr_schedule(step)),
                               "global_step": step})
        for loss in pending:
            total += float(loss)
            count += 1
        return total / max(1, count)

    def _eval_params(self):
        """EMA weights if enabled (``trainer.py:346-348``)."""
        return (self.state.ema_params if self.state.ema_params is not None
                else self.state.params)

    def _enhance(self, params, key, low, num_inference_steps=None):
        """Jitted full sampler, cached per step count (the step count is a
        trace-static loop bound — one compiled program per value)."""
        steps = (num_inference_steps if num_inference_steps is not None
                 else self.config.num_inference_steps)
        if steps not in self._enhance_cache:
            model, schedule = self.model, self.schedule
            self._enhance_cache[steps] = jax.jit(
                lambda p, k, x: enhance(model, schedule, {"params": p}, k, x,
                                        num_inference_steps=steps))
        return self._enhance_cache[steps](params, key, low)

    def validate(self) -> float:
        """Validation under EMA weights; loss is mse (faithful to
        ``trainer.py:340-363``).

        Ragged final batches are padded to the training batch size
        (``pad_batch``) and masked inside the sharded eval step, so every
        batch runs the same compiled program over the full mesh; the returned
        loss is the per-image mean over real images only.
        """
        from ..parallel.mesh import pad_batch

        params = self._eval_params()
        rng = jax.random.key(12345)
        total = 0.0
        count = 0
        for batch in tqdm(self.val_loader, desc="Validation"):
            arrays = {"low_light": batch["low_light"],
                      "normal_light": batch["normal_light"]}
            arrays, n_valid = pad_batch(arrays, self.config.batch_size)
            dev_batch = self._device_batch(arrays)
            rng, k = jax.random.split(rng)
            total += float(self.eval_step(params, k, dev_batch,
                                          n_valid)) * n_valid
            count += n_valid
        return total / max(1, count)

    def evaluate_quality(self, num_inference_steps: Optional[int] = None,
                         max_batches: Optional[int] = None) -> Dict[str, float]:
        """Full-sampler PSNR/SSIM eval on the val set — the LOL-15 parity
        metric the reference never computes (SURVEY §5/§6)."""
        params = self._eval_params()
        rng = jax.random.key(0)
        psnrs, ssims = [], []
        for i, batch in enumerate(self.val_loader):
            if max_batches is not None and i >= max_batches:
                break
            rng, k = jax.random.split(rng)
            out = self._enhance(params, k, jnp.asarray(batch["low_light"]),
                                num_inference_steps=num_inference_steps)
            pred = jnp.clip(denormalize_image(out.astype(jnp.float32)),
                            0.0, 1.0)
            target = denormalize_image(jnp.asarray(batch["normal_light"]))
            psnrs.append(float(psnr(pred, target)))
            ssims.append(float(ssim(pred, target)))
        return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}

    def generate_samples(self, epoch: int):
        """Sample grid from the first val/train batch (``trainer.py:365-389``)."""
        loader = self.val_loader or self.train_loader
        batch = next(iter(loader))
        n = self.config.num_samples
        low = jnp.asarray(batch["low_light"][:n])
        target = batch["normal_light"][:n]
        out = self._enhance(self._eval_params(), jax.random.key(epoch), low)
        path = self.output_dir / f"samples_epoch_{epoch}.png"
        save_comparison_grid(np.asarray(low), np.asarray(out), target,
                             str(path))
        if self.use_wandb:
            wandb.log({"samples": wandb.Image(str(path))})

    # ------------------------------------------------------------------
    def save_checkpoint(self, name: str):
        path = str(self.checkpoint_dir / name)
        if self._saver is not None:
            self._saver.save(path, self.state, epoch=self.epoch,
                             best_val_loss=self.best_val_loss,
                             config_json=to_json(self.config))
            print(f"Saving checkpoint (async): {name}")
        else:
            ckpt.save_checkpoint(path, self.state, epoch=self.epoch,
                                 best_val_loss=self.best_val_loss,
                                 config_json=to_json(self.config))
            print(f"Saved checkpoint: {name}")

    def wait_for_checkpoints(self):
        """Drain in-flight async saves (no-op for sync mode)."""
        if self._saver is not None:
            self._saver.wait()

    def load_checkpoint(self, path: str):
        self.wait_for_checkpoints()
        restored = ckpt.restore_checkpoint(path, self.state)
        self.state = restored["state"]
        self.epoch = restored["epoch"] + 1
        self.best_val_loss = restored["best_val_loss"]
        print(f"Loaded checkpoint from epoch {self.epoch - 1}")


def train_model(train_data_dir: str, val_data_dir: Optional[str] = None,
                config: Optional[TrainConfig] = None,
                use_synthetic: bool = False) -> Trainer:
    """Training entry point (``src/training/trainer.py:459-496``)."""
    from ..data.dataset import create_dataloaders

    config = config or TrainConfig()
    train_loader, val_loader = create_dataloaders(
        train_root=train_data_dir, val_root=val_data_dir,
        batch_size=config.batch_size, image_size=config.image_size,
        use_synthetic=use_synthetic, seed=config.seed,
        native=config.native_loader, prefetch=config.prefetch_batches,
        device_cache=config.data_on_device)

    dtype = "bfloat16" if config.use_amp else "float32"
    overrides = {}
    if config.qat_act:
        # activation-aware QAT: every QConv STE-fake-quantizes its input
        overrides["act_quant"] = "fake"
    model_cfg = diffusion_config(config.unet_variant, config.image_size,
                                 config.num_inference_steps, dtype=dtype,
                                 prediction_type=config.prediction_type,
                                 use_pallas=config.use_pallas,
                                 remat=config.remat, **overrides)
    model, schedule = create_model(model_cfg)
    trainer = Trainer(model, schedule, train_loader, val_loader, config)
    trainer.train()
    return trainer


class DistillationTrainer:
    """Host loop for LCM consistency distillation (teacher → student).

    The reference ships the distillation loss unwired
    (``src/models/low_light_diffusion.py:284-408``, SURVEY §2); here it is a
    full training mode: frozen teacher, student + EMA student, jitted
    distillation step, checkpoints of the student, sample grids from the EMA
    student (the LCM-deployable weights).
    """

    def __init__(self, model, schedule, teacher_params, train_loader,
                 val_loader=None, config: Optional[TrainConfig] = None,
                 num_ddim_timesteps: int = 50, ema_decay: float = 0.95,
                 mesh=None, canonical: bool = False,
                 pair_stride: Optional[int] = None,
                 sampler_matched: bool = False,
                 student_params=None,
                 regression: bool = False,
                 student_timesteps=None,
                 teacher_steps: Optional[int] = None,
                 deterministic_teacher: bool = False,
                 gt_weight: float = 0.0,
                 full_grad: bool = False,
                 teacher_model=None):
        from ..models.distillation import (create_distillation_state,
                                           make_distillation_step,
                                           make_regression_distillation_step)
        from .train_state import make_optimizer

        if teacher_model is not None and not regression:
            # adjacent-pair consistency inits/targets the student FROM the
            # teacher's weights — a different architecture can't do that
            raise ValueError("teacher_model (capacity-asymmetric "
                             "distillation) requires regression mode")

        self.config = config or TrainConfig()
        self.model = model
        self.schedule = schedule
        self.train_loader = train_loader
        self.val_loader = val_loader
        if mesh is False:
            self.mesh = None
        elif mesh is None:
            from ..parallel.mesh import auto_mesh
            self.mesh = auto_mesh(self.config.batch_size)
        else:
            self.mesh = mesh

        tx, self.lr_schedule = make_optimizer(self.config, len(train_loader))
        # Student starts as a (jitted, non-aliasing) copy of the teacher, or
        # warm-starts from an existing student (staged distillation: resume a
        # distillation run or distill an already-distilled student further).
        # With a DIFFERENT teacher architecture the copy is impossible —
        # the student random-inits fresh instead.
        if student_params is not None:
            init_from = student_params
        elif teacher_model is not None:
            from ..models.diffusion import init_model
            init_from = jax.jit(lambda k: init_model(model, k))(
                jax.random.key(self.config.seed))["params"]
        else:
            init_from = teacher_params
        student = jax.jit(
            lambda t: jax.tree_util.tree_map(lambda p: p + 0, t))(
            init_from)
        self.state = create_distillation_state(
            teacher_params, student, tx, jax.random.key(self.config.seed))
        # Regression mode (sampler_regression_loss): the student trains —
        # and must therefore be VALIDATED and sampled — on its own custom
        # grid, not the stock lcm_timesteps grid.
        self.student_timesteps = (tuple(int(t) for t in student_timesteps)
                                  if student_timesteps is not None else None)
        if regression:
            self.step_fn = make_regression_distillation_step(
                model, schedule, ema_decay=ema_decay,
                teacher_steps=(teacher_steps
                               or self.config.num_inference_steps),
                student_timesteps=self.student_timesteps or (739,),
                deterministic_teacher=deterministic_teacher,
                gt_weight=gt_weight, full_grad=full_grad,
                teacher_model=teacher_model, mesh=self.mesh)
            if self.student_timesteps is None:
                self.student_timesteps = (739,)
        else:
            self.step_fn = make_distillation_step(
                model, schedule, ema_decay=ema_decay,
                num_ddim_timesteps=num_ddim_timesteps,
                num_inference_steps=self.config.num_inference_steps,
                mesh=self.mesh, canonical=canonical, pair_stride=pair_stride,
                sampler_matched=sampler_matched)
        self._enhance = jax.jit(
            lambda params, k, x: enhance(
                model, schedule, {"params": params}, k, x,
                num_inference_steps=self.config.num_inference_steps,
                timesteps=self.student_timesteps))
        # Full-sampler val PSNR (per-image, vmapped) in ONE compiled program:
        # on the remote-compile backend every eager op is a separate compile,
        # so the metric must not run op-by-op (same pattern as
        # scripts/evaluate.py).  Clip to the displayable range first — that is
        # what any consumer of the enhanced image sees.
        def _batch_psnr(out, target):
            pred = jnp.clip(
                denormalize_image(out.astype(jnp.float32)), 0.0, 1.0)
            tgt = denormalize_image(target.astype(jnp.float32))
            return jax.vmap(lambda p, t: psnr(p[None], t[None]))(pred, tgt)
        self._val_psnr = jax.jit(_batch_psnr)
        self.best_val_psnr = float("-inf")

        self.epoch = 0
        self._saver = (ckpt.AsyncCheckpointSaver()
                       if (self.config.async_checkpoints
                           and jax.process_count() == 1) else None)
        self.output_dir = Path(self.config.output_dir)
        self.checkpoint_dir = Path(self.config.checkpoint_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)

    def _device_batch(self, batch):
        arrays = {"low_light": batch["low_light"],
                  "normal_light": batch["normal_light"]}
        if self.mesh is not None:
            return shard_batch(self.mesh, arrays)
        return jax.tree_util.tree_map(jnp.asarray, arrays)

    def train(self):
        print(f"Distilling on {jax.devices()} "
              f"({self.config.epochs} epochs)")
        for epoch in range(self.epoch, self.config.epochs):
            self.epoch = epoch
            pbar = tqdm(self.train_loader, desc=f"Distill epoch {epoch}")
            # Host syncs on the loss only at log intervals (same deferred
            # pattern as Trainer.train_epoch) — a per-step float() would
            # stall the device pipeline on the remote backend.
            pending = []
            for batch_idx, batch in enumerate(pbar):
                self.state, metrics = self.step_fn(
                    self.state, self._device_batch(batch))
                pending.append(metrics["loss"])
                if (batch_idx % self.config.log_interval == 0
                        and hasattr(pbar, "set_postfix")):
                    pbar.set_postfix({"loss": float(metrics["loss"])})
            total = sum(float(l) for l in pending)
            count = len(pending)
            print(f"Distill epoch {epoch}: loss={total / max(1, count):.4f} "
                  f"lr={float(self.lr_schedule(count * (epoch + 1))):.2e}")
            if self.val_loader is not None:
                val_psnr = self.validate_psnr()
                print(f"Distill epoch {epoch}: val_psnr={val_psnr:.2f} dB")
                # Students degrade with over-training (measured: canonical
                # 100 ep = 17.61 dB vs 20 ep = 18.70, BENCHMARKS.md quality
                # gate) — keep the best-by-val-PSNR student, not just the
                # last one.
                if val_psnr > self.best_val_psnr:
                    self.best_val_psnr = val_psnr
                    self.save_student("best_student")
            if (epoch + 1) % self.config.save_interval == 0:
                self.save_student(f"student_epoch_{epoch}")
            if (epoch + 1) % self.config.sample_interval == 0:
                self.generate_samples(epoch)
        self.save_student("student_final")
        # Drain async saves before returning: scripts/distill.py exits right
        # after train(), so without this a failed final best_student/
        # student_final write would be silently swallowed (exit 0) and an
        # in-process reader of the just-saved student would race the worker.
        if self._saver is not None:
            self._saver.wait()

    def validate_psnr(self) -> float:
        """Mean full-sampler PSNR of the EMA student over the val set.

        The sampler program is shape-specialized: ragged final batches are
        padded on the HOST to the training batch size (a straggler shape
        would recompile the whole k-step graph) and the padded lanes are
        dropped host-side after the fetch.
        """
        rng = jax.random.key(self.config.seed)
        scores = []
        for batch in self.val_loader:
            rng, k = jax.random.split(rng)
            low = np.asarray(batch["low_light"])
            tgt = np.asarray(batch["normal_light"])
            n_valid = low.shape[0]
            if n_valid < self.config.batch_size:
                pad = np.zeros(
                    (self.config.batch_size - n_valid,) + low.shape[1:],
                    low.dtype)
                low = np.concatenate([low, pad])
                tgt = np.concatenate([tgt, pad.astype(tgt.dtype)])
            out = self._enhance(self.state.ema_student_params, k,
                                jnp.asarray(low))
            per_image = np.asarray(
                self._val_psnr(out, jnp.asarray(tgt)))[:n_valid]
            scores.extend(float(s) for s in per_image)
        return float(np.mean(scores)) if scores else float("-inf")

    def generate_samples(self, epoch: int):
        loader = self.val_loader or self.train_loader
        batch = next(iter(loader))
        n = self.config.num_samples
        low = jnp.asarray(batch["low_light"][:n])
        out = self._enhance(self.state.ema_student_params,
                            jax.random.key(epoch), low)
        save_comparison_grid(np.asarray(low), np.asarray(out),
                             batch["normal_light"][:n],
                             str(self.output_dir /
                                 f"distill_samples_epoch_{epoch}.png"))

    def save_student(self, name: str):
        path = self.checkpoint_dir / name
        sidecar = None
        if self.student_timesteps is not None:
            # Regression students are grid-bound: record the deployment
            # timestep grid next to the params so inference/serving can pick
            # it up (the stock lcm_timesteps grid would be wrong for them).
            import json as _json
            sidecar = {"student_timesteps.json": _json.dumps(
                {"timesteps": list(self.student_timesteps)})}
        if self._saver is not None:
            self._saver.save_params(str(path), self.state.ema_student_params,
                                    config_json=to_json(self.model.config),
                                    sidecar=sidecar)
            print(f"Saving distilled student (async): {name}")
            return
        ckpt.save_params(str(path), self.state.ema_student_params,
                         config_json=to_json(self.model.config))
        if sidecar:
            for fname, text in sidecar.items():
                with open(path / fname, "w") as f:
                    f.write(text)
        print(f"Saved distilled student: {name}")
