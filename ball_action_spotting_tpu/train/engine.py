"""Training engine: the fit loop.

The idiomatic-JAX replacement for the pytorch-argus engine the reference
delegates to (``/root/reference/src/argus_models.py`` +
``scripts/ball_action/train.py:127-163``): builds the model/loss/optimizer
from a reference-style config dict, runs warmup+train stages as one fused LR
schedule, accumulates per-class metrics on host, logs per epoch to
log.txt/log.csv, and checkpoints the best-by-val-AP EMA weights.

Data parallel by construction: the jitted train step consumes the global
batch laid out over the mesh's data axis (GSPMD inserts the gradient
all-reduce over ICI); state is replicated.
"""

from __future__ import annotations

import csv
import logging
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ball_action_spotting_tpu.models import build_model
from ball_action_spotting_tpu.ops.losses import build_loss
from ball_action_spotting_tpu.parallel import mesh as mesh_lib
from ball_action_spotting_tpu.train import checkpoint as ckpt_lib
from ball_action_spotting_tpu.train.metrics import Accuracy, AveragePrecision
from ball_action_spotting_tpu.train.optim import build_optimizer
from ball_action_spotting_tpu.train.schedules import get_lr, warmup_cosine
from ball_action_spotting_tpu.train.state import TrainState
from ball_action_spotting_tpu.train.steps import (
    make_predict_step,
    make_train_step,
    make_val_step,
)

logger = logging.getLogger(__name__)


def _setup_file_logging(save_dir: Path, to_file: bool = True) -> logging.Logger:
    lg = logging.getLogger(f"bas_tpu.train.{save_dir}")
    lg.setLevel(logging.INFO)
    lg.handlers.clear()
    if to_file:  # multihost: only the primary process owns log.txt
        save_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(save_dir / "log.txt")
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s: %(message)s"))
        lg.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("%(message)s"))
    lg.addHandler(sh)
    lg.propagate = False
    return lg


class CsvLogger:
    """Per-epoch metric rows (reference argus LoggingToCSV). Columns can
    grow between stages (warmup rows carry no val metrics), so the file is
    rewritten with the union of fieldnames — epoch-granularity, cheap."""

    def __init__(self, path: Path):
        self.path = Path(path)
        self._rows: list[dict] = []
        self._fieldnames: list[str] = []

    def log(self, row: dict) -> None:
        self._rows.append(dict(row))
        for key in row:
            if key not in self._fieldnames:
                self._fieldnames.append(key)
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)


class Trainer:
    """Build-and-fit driver for one experiment stage set.

    ``config`` is a reference-style experiment dict (see ``configs/``);
    ``classes`` the domain classes; batches come from ``ClipLoader``-style
    iterables yielding (uint8 frames (B,T,H,W), float32 targets (B,C)).
    """

    def __init__(
        self,
        config: dict,
        classes: list[str],
        save_dir: Path,
        augment_fn: Optional[Callable] = None,
        mixup_fn: Optional[Callable] = None,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
        max_saves: int = 1,
        seed: int = 0,
        compute_dtype=jnp.bfloat16,
    ):
        self.config = config
        self.classes = classes
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        # multihost (pod) awareness — parallel/multihost.py: every process
        # runs the same program over the global mesh; only the primary
        # writes checkpoints/logs (assumes a shared experiment dir)
        self._nproc = jax.process_count()
        self._primary = jax.process_index() == 0
        self.logger = _setup_file_logging(self.save_dir, to_file=self._primary)
        self.csv_logger = CsvLogger(self.save_dir / "log.csv")
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.seed = seed

        ap = config["argus_params"]
        nn_name, nn_kwargs = ap["nn_module"]
        self.model = build_model(nn_name, dtype=compute_dtype, **nn_kwargs)
        self.loss = build_loss(ap["loss"][0], **ap["loss"][1])
        self.batch_size = config["batch_size"]
        self.image_size = tuple(ap["image_size"])  # (W, H)
        self.frame_stack_size = ap["frame_stack_size"]

        # one fused schedule over all stages (warmup → cosine); the length
        # must equal the batches the loader actually yields — ceil division
        # (ClipLoader drop_last=False), else the LR bottoms out early
        steps_per_epoch = steps_per_epoch or -(
            -config["train_epoch_size"] // config["batch_size"]
        )
        self.steps_per_epoch = steps_per_epoch
        stages = list(zip(config["num_epochs"], config["stages"]))
        warmup_epochs = sum(n for n, s in stages if s == "warmup")
        train_epochs = sum(n for n, s in stages if s == "train")
        self.stage_epochs = {"warmup": warmup_epochs, "train": train_epochs}
        opt_name, opt_kwargs = ap["optimizer"]
        base_lr = opt_kwargs.get("lr", 1e-3)
        min_lr = get_lr(config.get("min_base_lr", 0.0), config["batch_size"])
        schedule = warmup_cosine(
            base_lr,
            max(min_lr, 1e-8),
            warmup_steps=warmup_epochs * steps_per_epoch,
            cosine_steps=max(1, train_epochs * steps_per_epoch),
        )
        opt_kwargs = {k: v for k, v in opt_kwargs.items() if k != "lr"}
        self.tx = build_optimizer(
            opt_name,
            opt_kwargs,
            schedule=schedule,
            freeze_conv2d_encoder=bool(ap.get("freeze_conv2d_encoder", False)),
        )

        self.ema_decay = config.get("ema_decay", 0.999)
        # pipeline parallelism (config["pipeline_parallel"] = n_micro or
        # {"n_micro": N}): 2-stage GPipe over the mesh's model axis
        # (parallel/pipeline.py) instead of the GSPMD step. pp IS a
        # microbatching scheme, so it supersedes iter_size grad accum.
        pp_cfg = config.get("pipeline_parallel")
        self._pp_n_micro = (
            int(pp_cfg["n_micro"]) if isinstance(pp_cfg, dict)
            else int(pp_cfg) if pp_cfg else None
        )
        if self._pp_n_micro:
            from ball_action_spotting_tpu.parallel.pipeline import (
                make_pp_train_step,
            )

            assert int(ap.get("iter_size", 1)) == 1, (
                "pipeline_parallel replaces iter_size gradient accumulation "
                "(same microbatch semantics) — set one, not both")
            assert self._nproc == 1, (
                "pipeline_parallel is single-host; use the GSPMD step on pods")
            import math

            pad_to = math.lcm(
                int(np.prod(self.mesh.devices.shape)),
                self.mesh.shape["data"] * self._pp_n_micro,
            )
            if self.batch_size % pad_to:
                # fail at config time: _device_batches would otherwise pad
                # EVERY full batch (silent compute inflation + duplicated
                # rows in the unmasked train loss), not just the trailing
                # partial one
                raise ValueError(
                    f"pipeline_parallel: batch_size={self.batch_size} must "
                    f"be divisible by lcm(n_devices, data_axis*n_micro)="
                    f"{pad_to} (mesh {dict(self.mesh.shape)}, n_micro="
                    f"{self._pp_n_micro}) — otherwise every batch is padded "
                    "with duplicate rows"
                )
            self.train_step = jax.jit(
                make_pp_train_step(
                    self.model,
                    self.loss,
                    self.tx,
                    ema_decay=self.ema_decay,
                    mesh=self.mesh,
                    n_micro=self._pp_n_micro,
                    augment_fn=augment_fn,
                    mixup_fn=mixup_fn,
                ),
                donate_argnums=0,
            )
        else:
            self.train_step = jax.jit(
                make_train_step(
                    self.model,
                    self.loss,
                    self.tx,
                    ema_decay=self.ema_decay,
                    augment_fn=augment_fn,
                    mixup_fn=mixup_fn,
                    iter_size=int(ap.get("iter_size", 1)),
                ),
                donate_argnums=0,
            )
        # multihost: replicate val outputs (an XLA all-gather over the batch
        # axis) so every process can read predictions for host-side metrics
        self.val_step = jax.jit(
            make_val_step(self.model, self.loss),
            out_shardings=(
                mesh_lib.replicated(self.mesh) if self._nproc > 1 else None
            ),
        )
        self.predict_step = jax.jit(make_predict_step(self.model))

        self.ckpt_manager = ckpt_lib.CheckpointManager(
            self.save_dir,
            max_saves=max_saves,
            # "first" = argus stable-sort parity; "last" keeps the most
            # recent equal-best epoch (for saturating monitor metrics —
            # see CheckpointManager.tie_keep)
            tie_keep=config.get("checkpoint_tie_keep", "first"),
        )
        self.monitor = "val_average_precision"
        self.state: Optional[TrainState] = None

    # --- state/initialization -------------------------------------------

    def init_state(self, pretrain_variables: Optional[dict] = None) -> TrainState:
        h, w = self.image_size[1], self.image_size[0]
        x = jnp.zeros((1, self.frame_stack_size, h, w), jnp.float32)
        variables = self.model.init({"params": jax.random.PRNGKey(self.seed)}, x, train=False)
        nn_kwargs = self.config["argus_params"]["nn_module"][1]
        if pretrain_variables is not None:
            # stage pretrain (a prior experiment's checkpoint) supersedes the
            # ImageNet init, matching the reference where
            # load_weights_from_pretrain overwrites the timm init
            # (reference scripts/ball_action/train.py:51-61).
            variables = ckpt_lib.transfer_weights(dict(variables), pretrain_variables)
        elif nn_kwargs.get("pretrained", False):
            # ImageNet 2D-encoder bootstrap (reference
            # src/models/multidim_stacker.py:166-176). Fails loudly when the
            # local weight file is absent — see models/pretrained.py.
            from ball_action_spotting_tpu.models.pretrained import (
                apply_pretrained_encoder,
            )

            encoder_name = (
                "encoder" if self.config["argus_params"]["nn_module"][0]
                in ("timm", "classifier2d") else "conv2d_encoder"
            )
            variables = apply_pretrained_encoder(
                dict(variables),
                nn_kwargs["model_name"],
                encoder_name=encoder_name,
                stem_space_to_depth=bool(nn_kwargs.get("stem_space_to_depth", False)),
            )
            self.logger.info(
                f"Initialized {encoder_name} from ImageNet-pretrained "
                f"{nn_kwargs['model_name']}"
            )
        state = TrainState.create(variables, self.tx)
        self.state = mesh_lib.replicate_state(state, self.mesh)
        return self.state

    # --- epochs -----------------------------------------------------------

    def _device_batches(self, loader, epoch: int):
        """Yields (frames, targets, valid): batches padded to the mesh's
        data-axis size, device-resident, with the count of real rows.

        Multihost: the loader yields this process's LOCAL rows
        (``multihost.local_batch_size``); padding targets the per-process
        device share and ``prefetch_to_device`` assembles the global batch
        via ``make_array_from_process_local_data``. ``valid`` stays the
        local count."""
        from ball_action_spotting_tpu.data.loader import prefetch_to_device

        sharding = mesh_lib.batch_sharding(self.mesh)
        n_dev = max(1, int(np.prod(self.mesh.devices.shape)) // self._nproc)
        if self._pp_n_micro:
            # the pipelined step needs every data shard divisible into
            # n_micro microbatches
            import math

            n_dev = math.lcm(
                n_dev, self.mesh.shape["data"] * self._pp_n_micro)
        valids: list[int] = []

        def padded():
            iterator = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
            for frames, targets in iterator:
                frames, targets, valid = mesh_lib.pad_batch_to_devices(
                    frames, targets, n_dev
                )
                valids.append(valid)
                yield frames, targets

        for frames, targets in prefetch_to_device(padded(), sharding):
            yield frames, targets, valids.pop(0)

    def _assert_equal_multihost_steps(self, loader, what: str) -> None:
        """Every process must issue the SAME number of jitted (collective)
        calls per epoch — one process entering a step/allgather rendezvous
        the others never join hangs the pod forever. Fail loudly up front
        instead: gather each process's local batch count and compare.
        Shard sized val data with ``multihost.process_slice_even`` (equal
        shares), not ``process_slice`` (balanced ±1)."""
        if self._nproc <= 1:
            return
        from ball_action_spotting_tpu.parallel import multihost

        try:
            local = len(loader)
        except TypeError:
            raise TypeError(
                f"multihost {what} requires a sized loader (len(loader)) "
                "so equal per-process batch counts can be verified before "
                "entering the collective loop"
            ) from None
        counts = np.asarray(
            multihost.allgather(np.array([local], np.int64))
        ).reshape(-1)
        if len({int(c) for c in counts}) > 1:
            raise RuntimeError(
                f"multihost {what}: unequal per-process batch counts "
                f"{counts.tolist()} would deadlock the pod at the first "
                "missing collective call. Shard with "
                "multihost.process_slice_even (equal shares) rather than "
                "process_slice, and keep epoch_size/batch_size aligned "
                "across processes."
            )

    def train_epoch(self, loader, epoch: int) -> dict:
        assert self.state is not None, "call init_state first"
        self._assert_equal_multihost_steps(loader, "train_epoch")
        rng = jax.random.PRNGKey(self.seed + 1)
        losses = []
        t0 = time.time()
        n = 0
        for frames, targets, valid in self._device_batches(loader, epoch):
            self.state, aux = self.train_step(self.state, frames, targets, rng)
            losses.append(aux["loss"])
            n += valid
        losses = [float(l) for l in losses]
        dt = time.time() - t0
        # multihost: every process contributes the same local count, so the
        # fleet-wide throughput is local × process_count
        return {
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "train_samples_per_sec": n * self._nproc / dt if dt > 0 else 0.0,
        }

    def val_epoch(self, loader, epoch: int = 0) -> dict:
        assert self.state is not None
        self._assert_equal_multihost_steps(loader, "val_epoch")
        metrics = [AveragePrecision(self.classes),
                   Accuracy(self.classes, self.config.get("metric_accuracy_threshold", 0.5))]
        losses = []
        for frames, targets, valid in self._device_batches(loader, epoch):
            out = self.val_step(self.state, frames, targets)
            losses.append(float(out["loss"]))
            # drop mesh-padding duplicate rows from epoch metrics
            if self._nproc > 1:
                # outputs are replicated (out_shardings above) so every
                # process reads the full global batch; each process's rows
                # form one contiguous block with its padding at the tail
                from ball_action_spotting_tpu.parallel import multihost

                valids_all = np.asarray(
                    multihost.allgather(np.array([valid], np.int32))
                ).reshape(-1)
                pred = np.asarray(out["prediction"])
                targ = np.asarray(out["target"])
                rows_per_proc = pred.shape[0] // self._nproc
                keep = np.concatenate([
                    np.arange(p * rows_per_proc, p * rows_per_proc + int(v))
                    for p, v in enumerate(valids_all)
                ])
                trimmed = {"prediction": pred[keep], "target": targ[keep]}
            else:
                trimmed = {
                    "prediction": np.asarray(out["prediction"])[:valid],
                    "target": np.asarray(out["target"])[:valid],
                }
            for m in metrics:
                m.update(trimmed)
        results = {"val_loss": float(np.mean(losses)) if losses else float("nan")}
        for m in metrics:
            results.update(m.results("val_"))
        return results

    # --- fit ---------------------------------------------------------------

    def fit(self, train_loader, val_loader=None, pretrain_variables=None,
            resume: bool = True) -> dict:
        """Run all configured stages; returns the best epoch's metrics.

        With ``resume=True`` (default), an interrupted run restarts from the
        last completed epoch via the full-state checkpoint
        ``train_state.msgpack`` — mid-run recovery the reference lacks.
        Multihost: resume requires the experiment dir on a filesystem
        shared by all hosts (only the primary writes it; every process
        reads it so all restart from the same epoch).
        """
        if self.state is None:
            self.init_state(pretrain_variables)
        resume_path = self.save_dir / "train_state.msgpack"
        best = {self.monitor: -np.inf}
        start_epoch = 0
        if resume and resume_path.exists():
            self.state, start_epoch, best = ckpt_lib.load_train_state(
                resume_path, self.state
            )
            self.state = mesh_lib.replicate_state(self.state, self.mesh)
            self.logger.info(f"Resumed from {resume_path} at epoch {start_epoch}")

        epochs = [
            stage
            for num_epochs, stage in zip(self.config["num_epochs"], self.config["stages"])
            for _ in range(num_epochs)
        ]
        for epoch, stage in enumerate(epochs):
            if epoch < start_epoch:
                continue
            row = {"epoch": epoch, "stage": stage}
            row.update(self.train_epoch(train_loader, epoch))
            if stage == "train" and val_loader is not None:
                row.update(self.val_epoch(val_loader, epoch))
                score = row.get(self.monitor, -np.inf)
                if self._primary:  # multihost: one writer (shared exp dir)
                    self.ckpt_manager.save(
                        epoch,
                        score,
                        self._params_dict(),
                        self.state.model_variables(ema=True),
                        self.state.model_variables(ema=False),
                    )
                if score > best.get(self.monitor, -np.inf):
                    best = dict(row)
            self.logger.info(
                " ".join(f"{k}={v:.6f}" if isinstance(v, float) else f"{k}={v}"
                         for k, v in row.items())
            )
            if self._primary:
                self.csv_logger.log(row)
            if resume and self._primary:
                ckpt_lib.save_train_state(resume_path, self.state, epoch, best)
        if resume and self._primary and resume_path.exists() and epochs:
            resume_path.unlink()  # run completed; drop the resume point
        return best

    def _params_dict(self) -> dict:
        ap = dict(self.config["argus_params"])
        return {
            "nn_module": list(ap["nn_module"]),
            "loss": list(ap["loss"]),
            "optimizer": list(ap["optimizer"]),
            "image_size": list(self.image_size),
            "frame_stack_size": ap["frame_stack_size"],
            "frame_stack_step": ap["frame_stack_step"],
            "frames_processor": list(ap["frames_processor"]),
            "freeze_conv2d_encoder": bool(ap.get("freeze_conv2d_encoder", False)),
        }
