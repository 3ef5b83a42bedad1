"""Experiment logging & observability.

Replaces the reference's W&B + FilesystemLogger pair
(util/filesystem_logger.py, WandbLogger in both trainers):
  * `FilesystemLogger`: snapshots the source tree + resolved config into
    runs/<experiment>/code at run start (rank-zero only) — same artifact the
    reference produces;
  * `MetricsLogger`: JSONL stream of scalar metrics per step under
    runs/<experiment>/metrics.jsonl (W&B is gated: used when importable AND
    wandb_main is set, otherwise the JSONL file is the system of record);
  * `trace_profile`: context manager around jax.profiler for on-demand TPU
    traces — the observability upgrade over the reference's wall-clock Timer.
"""

from __future__ import annotations

import contextlib
import json
import shutil
import time
from pathlib import Path

import yaml


class FilesystemLogger:
    """Snapshot source + config into the experiment dir (rank-zero only)."""

    SRC_SUFFIXES = {".py", ".pyx", ".txt", ".so", ".pyd", ".h", ".cu", ".c", ".cpp", ".html", ".yaml"}

    def __init__(self, experiment_config: dict, repo_root: Path | None = None, process_index: int = 0):
        self.experiment_config = experiment_config
        if process_index != 0:
            return
        experiment_dir = Path("runs", experiment_config["experiment"])
        experiment_dir.mkdir(exist_ok=True, parents=True)
        root = repo_root or Path(__file__).resolve().parents[1]
        code_dir = experiment_dir / "code"
        for f in root.rglob("*"):
            if (f.is_file() and f.suffix in self.SRC_SUFFIXES
                    and "__pycache__" not in f.parts and "runs" not in f.parts):
                rel = f.relative_to(root)
                dest = code_dir / rel
                dest.parent.mkdir(parents=True, exist_ok=True)
                shutil.copyfile(f, dest)
        (experiment_dir / "config.yaml").write_text(
            yaml.dump({k: v for k, v in experiment_config.items() if _yaml_safe(v)}))


def _yaml_safe(v) -> bool:
    try:
        yaml.dump(v)
        return True
    except Exception:
        return False


class MetricsLogger:
    """Append-only JSONL metric stream + optional W&B mirroring."""

    def __init__(self, experiment: str, project: str = "", use_wandb: bool = False,
                 process_index: int = 0):
        self.process_index = process_index
        self.path = Path("runs", experiment, "metrics.jsonl")
        if process_index == 0:
            self.path.parent.mkdir(exist_ok=True, parents=True)
            self._fh = self.path.open("a")
        self._wandb = None
        if use_wandb and process_index == 0:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, name=experiment, id=experiment, resume="allow")
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: int | None = None):
        if self.process_index != 0:
            return
        rec = {"_time": time.time()}
        if step is not None:
            rec["_step"] = step
        rec.update({k: float(v) if hasattr(v, "__float__") else v for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self.process_index == 0:
            self._fh.close()


@contextlib.contextmanager
def trace_profile(log_dir, enabled: bool = True):
    """jax.profiler trace around a code region (view with TensorBoard/xprof)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_images(logger: "MetricsLogger", image_dir, step: int | None = None,
               prefix: str = "visualization") -> int:
    """Mirror rendered JPEG panels to W&B when available (the reference
    uploads render panels per epoch, trainer/train_retrieval.py:143-145);
    always records the file list in the JSONL stream. Returns #images."""
    from pathlib import Path
    images = sorted(Path(image_dir).glob("*.jpg"))
    if not images:
        return 0
    logger.log({f"{prefix}/count": len(images),
                f"{prefix}/dir": str(image_dir)}, step=step)
    if logger._wandb is not None:
        wandb = logger._wandb
        logger._wandb.log(
            {f"{prefix}/{im.name}": [wandb.Image(str(im))] for im in images},
            step=step)
    return len(images)
