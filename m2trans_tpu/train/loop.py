"""Training driver: one jit-compiled train step (forward + losses + grads +
optax update, donated buffers), data-parallel over a `jax.sharding.Mesh`.

Functional equivalent of the reference's train loop (train.py:160-358):
Adam(weight_decay=0) + per-epoch cosine annealing, L1 + semantic CLIP loss,
cutmix/cutout augmentation, periodic validation with Y-channel PSNR/SSIM,
best-metric stat tracking, per-epoch checkpoints, resume-from-latest.

TPU-first differences:
  * augmentations run on-device inside the step (data/augment.py);
  * the CLIP loss is batched and differentiable under jit (losses/semantic.py)
    instead of a per-sample host loop under no_grad (reference quirk 1-2,
    SURVEY.md §2.2) — the faithful behavior is available via cfg.faithful_clip;
  * DP via GSPMD: batch sharded over the 'data' mesh axis, params replicated,
    gradient all-reduce inserted by XLA (replaces nn.DataParallel);
  * orbax async checkpoints instead of torch.save.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m2trans_tpu.config import Config
from m2trans_tpu.data import create_datasets
from m2trans_tpu.data.augment import cut_out, cutmix
from m2trans_tpu.losses import l1_loss
from m2trans_tpu.models import (
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from m2trans_tpu.models.m2trans import trainable_mask
from m2trans_tpu.train import checkpoint as ckpt_lib
from m2trans_tpu.train.evaluate import evaluate_all
from m2trans_tpu.utils.experiment import (
    ExperimentLogger,
    get_stat_dict,
    setup_experiment,
)


def _comparison_panel(lr_np: np.ndarray, sr_np: np.ndarray,
                      hr_np: np.ndarray, rgb_range: float) -> np.ndarray:
    """HWC uint8 [bilinear-upscaled LR | SR | HR] strip (the reference's
    TensorBoard image dump, train.py:218-233)."""
    from m2trans_tpu.ops.resize import bilinear_resize

    h, w = hr_np.shape[0], hr_np.shape[1]
    lr_up = np.asarray(bilinear_resize(
        jnp.asarray(lr_np)[None], (h, w))[0])
    panel = np.concatenate([lr_up, sr_np, hr_np], axis=1)
    return np.clip(panel / rgb_range * 255.0, 0, 255).astype(np.uint8)


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + per-epoch cosine annealing (reference train.py:81-82,358),
    with the dead MeanShift params frozen."""

    def lr_schedule(count):
        epoch0 = jnp.floor(count / steps_per_epoch)
        return cfg.eta_min + (cfg.lr - cfg.eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch0 / cfg.epochs)) / 2.0

    adam = optax.adam(learning_rate=lr_schedule)
    return optax.masked(adam, trainable_mask)


def make_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    semantic_loss_fn: Optional[Callable] = None,
):
    """Builds the jitted train step. ``do_cutout`` is a static arg (two
    executables at most: cutout only runs while epoch < 0.2*epochs,
    reference train.py:180-181)."""
    policy = policy_from_config(cfg, for_training=True)
    cutout_len = int(0.1 * cfg.patch_size // cfg.scale)

    @partial(jax.jit, static_argnames=("do_cutout",), donate_argnums=(0, 1))
    def train_step(params, opt_state, lr_img, hr_img, key, captions,
                   sample_mask=None, do_cutout=False, clip_params=None):
        k_mix, k_cut, k_clip, k_noise = jax.random.split(key, 4)
        if cfg.cutmix:
            lr_img, hr_img = cutmix(k_mix, lr_img, hr_img, scale=cfg.scale)
        if do_cutout:
            lr_img = cut_out(k_cut, lr_img, length=cutout_len)
        if cfg.data_add_noise:
            from m2trans_tpu.data.augment import gaussian_noise

            ka, kb = jax.random.split(k_noise)
            lr_img = jnp.where(jax.random.uniform(ka) < 0.5,
                               gaussian_noise(kb, lr_img), lr_img)

        # Staged CLIP loss (reference losses.py:18-81 semantics): the
        # text embedding, crop offsets, and HR-side similarities carry
        # no d/d(sr) or d/d(params), so they are computed here — OUTSIDE
        # the differentiated closure — and only the SR-side vision
        # encoder runs inside the grad program. Measured -16.7 ms/step
        # (bf16 MedCLIP) / -19.7 (f32) at the x4 recipe vs the
        # monolithic formulation (CLIP_STAGED_r05.json); composition is
        # parity-tested against semantic_loss. MedCLIP weights flow in
        # as the traced clip_params argument: a closure capture bakes
        # the 89 MB BERT table into the serialized compile payload,
        # which a remote AOT compile service rejects (HTTP 413 through
        # the axon tunnel; local PJRT merely bloats).
        clip_const = None
        mc_params = None
        if (semantic_loss_fn is not None and cfg.lambda_clip > 0
                and captions is not None):
            mc_params = (clip_params if clip_params is not None
                         else semantic_loss_fn.params)
            clip_const = semantic_loss_fn.const_stage_from_params(
                mc_params, hr_img, captions, k_clip)

        def loss_fn(p):
            sr = m2trans_apply(p, lr_img, cfg, policy=policy)
            if sample_mask is None:
                l1 = l1_loss(sr, hr_img) * cfg.lambda_l1
            else:
                # faithful tail batch (reference drop_last=False): loss
                # averaged over the valid samples only — the padded
                # duplicates contribute zero gradient
                per = jnp.mean(jnp.abs(sr.astype(jnp.float32)
                                       - hr_img.astype(jnp.float32)),
                               axis=(1, 2, 3))
                l1 = (jnp.sum(per * sample_mask)
                      / jnp.sum(sample_mask)) * cfg.lambda_l1
            clip = jnp.float32(0.0)
            if clip_const is not None:
                clip = semantic_loss_fn.loss_staged_from_params(
                    mc_params, sr, clip_const) * cfg.lambda_clip
            return l1 + clip, {"l1": l1, "clip": clip}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state_new = tx.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        aux["loss"] = loss
        return params_new, opt_state_new, aux

    return train_step


class Trainer:
    def __init__(self, cfg: Config,
                 semantic_loss_fn: Optional[Callable] = None,
                 writer: Any = None):
        self.cfg = cfg
        self.semantic_loss_fn = semantic_loss_fn
        self.writer = writer

        self.train_loader, self.eval_sets = create_datasets(cfg)
        self.steps_per_epoch = len(self.train_loader)
        if self.steps_per_epoch == 0:
            raise ValueError("empty training set")

        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        self.train_step = make_train_step(cfg, self.tx, semantic_loss_fn)
        policy = policy_from_config(cfg)
        self._panel_fwd = jax.jit(
            lambda p, x: m2trans_apply(p, x, cfg, policy=policy))

        key = jax.random.PRNGKey(cfg.seed)
        self.rng_key, init_key = jax.random.split(key)
        self.params = init_m2trans(init_key, cfg)
        if cfg.pretrain:
            self.params = ckpt_lib.load_params_any(cfg.pretrain, cfg)
            print(f"## load pretrained model: {cfg.pretrain}! ##")
        self.opt_state = self.tx.init(self.params)
        self.start_epoch = 1
        self.stat_dict = get_stat_dict(cfg.eval_sets)

        # experiment tree + resume
        (self.experiment_path, self.models_path, log_file,
         _) = setup_experiment(cfg)
        self.ckpt_mgr = ckpt_lib.make_manager(self.models_path)
        if cfg.resume:
            restored = ckpt_lib.restore_latest(
                self.ckpt_mgr,
                {"params": self.params, "opt_state": self.opt_state})
            if restored is not None:
                epoch, state, stat = restored
                self.params = state["params"]
                self.opt_state = state["opt_state"]
                self.stat_dict = stat
                self.start_epoch = epoch + 1
                print(f"## resume training from epoch {self.start_epoch}. ##")
        sys.stdout = ExperimentLogger(log_file, sys.stdout)

        # data-parallel sharding over the 'data' mesh axis
        self.mesh = None
        self.batch_sharding = None
        n_data = cfg.mesh_data
        if n_data > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devices = np.array(jax.devices()[:n_data]).reshape(n_data)
            self.mesh = Mesh(devices, ("data",))
            self.batch_sharding = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

        # captions for the semantic loss (reference train.py:156-157, 189-193)
        self.captions = None
        if semantic_loss_fn is not None and cfg.captions_path:
            with open(cfg.captions_path, encoding="utf-16") as f:
                self.captions = [line.strip() for line in f.readlines()]

    def _put_batch(self, lr, hr):
        if self.batch_sharding is not None and jax.process_count() > 1:
            # Multi-host DP: every host's loader yields the same
            # deterministic global batch (batch-index-derived RNG); each
            # host materializes only its slice and contributes it to the
            # global array. Decode-and-discard of the non-local slice is
            # accepted at this model's data rates (SURVEY.md §2.5).
            pc, pi = jax.process_count(), jax.process_index()
            if lr.shape[0] % pc:
                raise ValueError(
                    f"global batch {lr.shape[0]} must divide evenly over "
                    f"{pc} hosts — integer truncation would silently drop "
                    f"trailing samples (set batch_size to a multiple of "
                    f"process_count)")
            shard = lr.shape[0] // pc
            lo = pi * shard
            lr = jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(lr[lo:lo + shard]))
            hr = jax.make_array_from_process_local_data(
                self.batch_sharding, np.asarray(hr[lo:lo + shard]))
            return lr, hr
        lr = jnp.asarray(lr)
        hr = jnp.asarray(hr)
        if self.batch_sharding is not None:
            lr = jax.device_put(lr, self.batch_sharding)
            hr = jax.device_put(hr, self.batch_sharding)
        return lr, hr

    def _batch_captions(self, it: int, batch_size: int):
        if self.captions is None:
            return None
        n = len(self.captions)
        idx = [(it * batch_size + i) % n for i in range(batch_size)]
        return [self.captions[i] for i in idx]

    def run(self) -> Dict:
        cfg = self.cfg
        timer_start = time.time()
        for epoch in range(self.start_epoch, cfg.epochs + 1):
            self.stat_dict["epochs"] = epoch
            do_cutout = bool(cfg.cutout) and epoch < (cfg.epochs * 0.2)
            epoch_loss = l1_acc = clip_acc = 0.0

            for it, batch in enumerate(self.train_loader):
                lr_np, hr_np = batch[0], batch[1]
                mask_np = batch[2] if len(batch) > 2 else None
                lr_img, hr_img = self._put_batch(lr_np, hr_np)
                mask = jnp.asarray(mask_np) if mask_np is not None else None
                self.rng_key, step_key = jax.random.split(self.rng_key)
                caps = self._batch_captions(it, lr_np.shape[0])
                cap_tok = (self.semantic_loss_fn.tokenize(caps)
                           if caps is not None and
                           hasattr(self.semantic_loss_fn, "tokenize")
                           else None)
                clip_p = (self.semantic_loss_fn.params
                          if cap_tok is not None and
                          hasattr(self.semantic_loss_fn, "params")
                          else None)
                self.params, self.opt_state, aux = self.train_step(
                    self.params, self.opt_state, lr_img, hr_img, step_key,
                    cap_tok, mask, do_cutout=do_cutout, clip_params=clip_p)

                epoch_loss += float(aux["loss"])
                l1_acc += float(aux["l1"])
                clip_acc += float(aux["clip"])

                # profiler trace of a few steady-state steps
                if cfg.profile_dir and epoch == self.start_epoch:
                    if it == 5:
                        jax.profiler.start_trace(cfg.profile_dir)
                    elif it == 10:
                        jax.profiler.stop_trace()

                # TensorBoard comparison panels (reference train.py:218-233)
                if self.writer is not None and it % 200 == 0:
                    sr1 = np.asarray(self._panel_fwd(
                        self.params, lr_img[:1]))[0]
                    panel = _comparison_panel(lr_np[0], sr1, hr_np[0],
                                              cfg.rgb_range)
                    self.writer.add_image("Train/lr_sr_hr_image", panel,
                                          it, dataformats="HWC")

                if (it + 1) % cfg.log_every == 0:
                    avg = epoch_loss / (it + 1)
                    # faithful reference quirk: the logged stat divides the
                    # running average by (iter+1) a second time
                    # (reference train.py:248)
                    self.stat_dict["losses"].append(avg / (it + 1))
                    dur = time.time() - timer_start
                    timer_start = time.time()
                    print(
                        f"Epoch:{epoch}, {(it + 1) * cfg.batch_size}/"
                        f"{len(self.train_loader.dataset)}, loss: {avg:.4f}, "
                        f"L1loss: {l1_acc / (it + 1):.4f}, "
                        f"CLIPloss: {clip_acc / (it + 1):.8f} "
                        f"time: {dur:.3f}")
                    if self.writer is not None:
                        step = ((epoch - 1) * self.steps_per_epoch + it + 1)
                        self.writer.add_scalar(
                            "Train/loss", float(aux["loss"]),
                            step * cfg.batch_size)

            if epoch % cfg.test_every == 0:
                self._validate(epoch)
                self._save(epoch)
        self.ckpt_mgr.wait_until_finished()
        return self.stat_dict

    def _validate(self, epoch: int) -> None:
        cfg = self.cfg
        save_root = None
        if cfg.save_image:
            save_root = f"{self.experiment_path}/test_results_x{cfg.scale}"
        results = evaluate_all(self.params, cfg, self.eval_sets,
                               save_root=save_root, writer=self.writer,
                               writer_step=epoch)
        log = ""
        for name, m in results.items():
            s = self.stat_dict[name]
            s["psnrs"].append(m["psnr"])
            s["ssims"].append(m["ssim"])
            if m["psnr"] > s["best_psnr"]["value"]:
                s["best_psnr"] = {"value": m["psnr"], "epoch": epoch}
            if m["ssim"] > s["best_ssim"]["value"]:
                s["best_ssim"] = {"value": m["ssim"], "epoch": epoch}
            if self.writer is not None:
                self.writer.add_scalar(f"Valid_{name}/PSNR", m["psnr"], epoch)
                self.writer.add_scalar(f"Valid_{name}/SSIM", m["ssim"], epoch)
            log += (
                "[{}-X{}], PSNR/SSIM: {:.4f}/{:.4f} "
                "(Best: {:.4f}/{:.4f}, Epoch: {}/{})\n".format(
                    name, cfg.scale, m["psnr"], m["ssim"],
                    s["best_psnr"]["value"], s["best_ssim"]["value"],
                    s["best_psnr"]["epoch"], s["best_ssim"]["epoch"]))
        print(log, end="")
        sys.stdout.flush()

    def _save(self, epoch: int) -> None:
        import yaml

        ckpt_lib.save_state(
            self.ckpt_mgr, epoch,
            {"params": self.params, "opt_state": self.opt_state},
            self.stat_dict)
        with open(f"{self.experiment_path}/stat_dict.yml", "w") as f:
            yaml.dump(self.stat_dict, f, default_flow_style=False)
