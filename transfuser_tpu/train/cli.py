"""Training CLI (the reference train.py:30-211 surface, TPU-native).

torchrun/DDP/NCCL initialization is replaced by a jax Mesh: single-host
multi-chip works out of the box (`--mesh_data=jax.device_count()`);
multi-host adds `jax.distributed.initialize()` (SURVEY.md §5.8).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train TransFuser-TPU")
    p.add_argument("--id", type=str, default="transfuser",
                   help="Unique experiment identifier.")
    p.add_argument("--epochs", type=int, default=41)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=12,
                   help="Per-chip batch size; global = batch_size * n_data")
    p.add_argument("--logdir", type=str, default="log")
    p.add_argument("--load_epoch", type=int, default=None,
                   help="Checkpoint epoch to resume from.")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--setting", type=str, default="all",
                   choices=["all", "02_05_withheld"])
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--schedule", type=int, default=1)
    p.add_argument("--schedule_reduce_epoch_01", type=int, default=30)
    p.add_argument("--schedule_reduce_epoch_02", type=int, default=40)
    p.add_argument("--backbone", type=str, default="transFuser",
                   choices=["transFuser", "late_fusion", "geometric_fusion",
                            "latentTF"])
    p.add_argument("--image_architecture", type=str, default="regnety_032")
    p.add_argument("--lidar_architecture", type=str, default="regnety_032")
    p.add_argument("--use_velocity", type=int, default=0)
    p.add_argument("--n_layer", type=int, default=4)
    p.add_argument("--wp_only", type=int, default=0)
    p.add_argument("--use_target_point_image", type=int, default=1)
    p.add_argument("--use_point_pillars", type=int, default=0)
    p.add_argument("--val_every", type=int, default=5)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="Global-norm gradient clip; 0 disables (default: "
                        "the reference trains unclipped, and the r5 A/B "
                        "measured clip=1.0 DIVERGING on the flagship — "
                        "PERF_NOTES 'grad clipping divergence').")
    p.add_argument("--agc_clip", type=float, default=0.0,
                   help="NFNet-style adaptive (per-block, weight-relative) "
                        "gradient clipping; 0 disables. The random-init "
                        "stabilizer: unlike --grad_clip it cannot let one "
                        "exploding head starve the others.")
    p.add_argument("--warmup_epochs", type=float, default=0.0,
                   help="Linear LR warmup in epochs; 0 disables "
                        "(reference parity — it fine-tunes ImageNet "
                        "weights and needs none).")
    p.add_argument("--no_bev_loss", type=int, default=0)
    p.add_argument("--sync_batch_norm", type=int, default=1,
                   help="Global batch-norm stats (free under GSPMD).")
    p.add_argument("--zero_redundancy_optimizer", type=int, default=1)
    p.add_argument("--mesh_data", type=int, default=0,
                   help="Data-parallel axis size; 0 = all devices.")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="Tensor-parallel axis size for the fusion GPT.")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_restarts", type=int, default=3,
                   help="In-job elastic retries: failed epochs reload the "
                        "last checkpoint and continue.")
    p.add_argument("--group_lowering", type=str, default="auto",
                   choices=["native", "dense", "chunked", "im2col",
                            "auto"],
                   help="Grouped-conv lowering; 'auto' (dense for few "
                        "groups, 128-wide chunked block-diagonal above) "
                        "is the measured-fastest on TPU (PERF_NOTES); "
                        "'native' for CPU debugging.")
    p.add_argument("--remat", type=str, default="early",
                   choices=["none", "early", "all"],
                   help="Backward-pass rematerialization. Default 'early':"
                        " the no-remat flagship grad program peaks ~13.7 "
                        "of 16 GB HBM, and real training streams DISTINCT "
                        "per-step batches whose staging tips the "
                        "allocator into thrash/OOM (PERF_NOTES round 4; "
                        "~5-10%% step-time cost, full-rate streaming).")
    p.add_argument("--multihost", type=int, default=0,
                   help="Call jax.distributed.initialize() and shard the "
                        "loader by process (replaces torchrun rendezvous "
                        "+ DistributedSampler, train.py:93-106,157-158).")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multihost; None = "
                        "auto-detect on TPU pods).")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--per_step_metrics", type=int, default=0,
                   help="Fetch metrics device->host every step (precise "
                        "per-epoch means, but each fetch is a hard sync "
                        "that serializes the axon dispatch pipeline — "
                        "PERF_NOTES). Default: fetch once at epoch end.")
    p.add_argument("--wire", type=str, default="packed",
                   choices=("packed", "f32"),
                   help="Batch wire format: 'packed' ships uint8/uint16 "
                        "and widens on device (data/pack.py; ~3.5x fewer "
                        "bytes over the host->device link), 'f32' ships "
                        "the legacy float arrays.")
    p.add_argument("--device_cache", type=int, default=0,
                   help="Hold the whole (packed) train set resident in "
                        "device memory and gather batches on device "
                        "(data/device_cache.py). Removes per-step wire "
                        "traffic; requires the set to fit in HBM and "
                        "FORCES augment=False (augmentation is sampled "
                        "at decode time). Single-process only.")
    p.add_argument("--echo_window", type=int, default=0,
                   help="Rotating-window device cache WITH live "
                        "augmentation (data/echo_cache.py): N samples "
                        "stay HBM-resident, batches gather on device, a "
                        "background thread re-decodes freshly augmented "
                        "samples and chunks swap in between steps "
                        "(data-echoing). 0 = off. Single-process only; "
                        "mutually exclusive with --device_cache.")
    return p


def config_from_args(args: argparse.Namespace):
    from ..config import GlobalConfig

    cfg = GlobalConfig(root_dir=args.root_dir, setting=args.setting)
    gpt = dataclasses.replace(cfg.model.gpt, n_layer=args.n_layer)
    model = dataclasses.replace(
        cfg.model, backbone=args.backbone,
        image_architecture=args.image_architecture,
        lidar_architecture=args.lidar_architecture,
        use_velocity=bool(args.use_velocity),
        use_target_point_image=bool(args.use_target_point_image),
        point_pillars=dataclasses.replace(
            cfg.model.point_pillars,
            use_point_pillars=bool(args.use_point_pillars)),
        group_lowering=args.group_lowering,
        remat=args.remat if args.remat != "none" else False,
        gpt=gpt)
    weights = list(cfg.loss.detailed_losses_weights)
    if args.wp_only:
        weights = [1.0] + [0.0] * (len(weights) - 1)
    if args.no_bev_loss:
        weights[cfg.loss.detailed_losses.index("loss_bev")] = 0.0
    loss = dataclasses.replace(
        cfg.loss, detailed_losses_weights=tuple(weights))
    train = dataclasses.replace(
        cfg.train, lr=args.lr, epochs=args.epochs,
        batch_size=args.batch_size,
        schedule_reduce_epoch_01=args.schedule_reduce_epoch_01
        if args.schedule else 10 ** 9,
        schedule_reduce_epoch_02=args.schedule_reduce_epoch_02
        if args.schedule else 10 ** 9,
        val_every=args.val_every,
        grad_clip_norm=args.grad_clip,
        agc_clip=args.agc_clip,
        warmup_epochs=args.warmup_epochs,
        zero_redundancy_optimizer=bool(args.zero_redundancy_optimizer),
        seed=args.seed)
    return cfg.replace(model=model, loss=loss, train=train)


from .elastic import record


@record
def main(argv: Optional[list] = None) -> None:
    import jax

    from ..data.dataset import CarlaDataset
    from ..data.loader import PrefetchLoader
    from ..parallel import sharding as shd
    from .checkpoint import AsyncCheckpointWriter, save_config_snapshot
    from .trainer import Trainer

    args = build_argparser().parse_args(argv)
    if args.multihost:
        # torchrun-rendezvous equivalent (train.py:93-106): one JAX
        # process per host; jax.devices() becomes the global device set
        # and XLA collectives ride ICI/DCN between them.
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
    proc_rank = jax.process_index()
    proc_count = jax.process_count()
    is_chief = proc_rank == 0

    cfg = config_from_args(args)
    logdir = os.path.join(args.logdir, args.id)
    os.makedirs(logdir, exist_ok=True)
    if is_chief:
        save_config_snapshot(logdir, cfg)
        with open(os.path.join(logdir, "args.txt"), "w") as f:
            json.dump(vars(args), f, indent=2)

    writer = None
    if is_chief:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(logdir)
        except Exception:
            writer = None

    n_devices = jax.device_count()
    n_data = args.mesh_data or (n_devices // max(args.mesh_model, 1))
    mesh = None
    if n_data * args.mesh_model > 1:
        mesh = shd.make_mesh(shd.MeshSpec(data=n_data,
                                          model=args.mesh_model))
    if is_chief:
        print(f"devices={n_devices} processes={proc_count} "
              f"mesh=({n_data}x{args.mesh_model})")

    train_dirs, val_dirs = cfg.resolve_splits()
    packed = args.wire == "packed"
    use_device_cache = bool(args.device_cache)
    use_echo = bool(args.echo_window)
    if use_device_cache and use_echo:
        raise SystemExit("--device_cache and --echo_window are mutually "
                         "exclusive cache tiers")
    if (use_device_cache or use_echo) and proc_count > 1:
        raise SystemExit("device cache tiers are single-process only")
    train_set = CarlaDataset(train_dirs, cfg, packed=packed,
                             augment=False if use_device_cache else None)
    val_set = CarlaDataset(val_dirs, cfg, augment=False, packed=packed)
    global_batch = args.batch_size * n_data
    if global_batch % proc_count:
        raise SystemExit(f"global batch {global_batch} not divisible by "
                         f"{proc_count} processes")
    local_batch = global_batch // proc_count
    if is_chief:
        print(f"train samples={len(train_set)} val={len(val_set)} "
              f"global_batch={global_batch} local_batch={local_batch}")

    steps_per_epoch = max(1, len(train_set) // global_batch)
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=steps_per_epoch)

    # Each process loads only its sample shard (DistributedSampler
    # semantics, train.py:157-158); Trainer.put_batch assembles the
    # global array from the local rows.
    # Single-process, no mesh: workers device_put their batches so uploads
    # overlap both decode and device compute (the tunnel is bandwidth-
    # bound, PERF_NOTES round-4 transfer probe). Under a mesh/multi-host,
    # Trainer.put_batch owns placement.
    put = None
    if mesh is None and proc_count == 1:
        put = jax.device_put
    if use_device_cache:
        from ..data.device_cache import DeviceCacheLoader, fits
        if not fits(train_set, 8 << 30):
            raise SystemExit("--device_cache: train set exceeds the 8 GB "
                             "HBM budget; use the packed PrefetchLoader")
        if is_chief:
            print("[device_cache] uploading train set to HBM "
                  "(augment forced off)")
        train_loader = DeviceCacheLoader(
            train_set, local_batch, shuffle=True, seed=args.seed,
            log=lambda m: print(f"[device_cache] {m}"))
    elif use_echo:
        from ..data.echo_cache import EchoCacheLoader
        train_loader = EchoCacheLoader(
            train_set, local_batch, window=args.echo_window,
            seed=args.seed,
            log=lambda m: print(f"[echo_cache] {m}") if is_chief else None)
    else:
        train_loader = PrefetchLoader(train_set, local_batch, shuffle=True,
                                      num_workers=args.num_workers,
                                      seed=args.seed,
                                      device_put=put,
                                      shard_rank=proc_rank,
                                      shard_count=proc_count)
    val_loader = PrefetchLoader(val_set, local_batch, shuffle=False,
                                num_workers=args.num_workers,
                                device_put=put,
                                shard_rank=proc_rank,
                                shard_count=proc_count)

    example = next(iter(train_loader))
    trainer.init_state(example, seed=args.seed)
    ckpt = AsyncCheckpointWriter(logdir)
    if args.load_epoch is not None:
        trainer.state = ckpt.restore(args.load_epoch, trainer.state)
        print(f"resumed from epoch {args.load_epoch}")

    # In-job elastic recovery (torchelastic restart semantics): a failed
    # epoch writes the structured error file, reloads the last good
    # checkpoint, and retries — up to --max_restarts times.
    epoch = args.start_epoch
    restarts = 0
    last_saved = args.load_epoch
    history = []
    best_val_ade, best_epoch = None, None
    while epoch < args.epochs:
        try:
            train_loader.set_epoch(epoch)
            t0 = time.time()
            metrics = trainer.train_epoch(
                iter(train_loader),
                fetch_metrics=bool(args.per_step_metrics))
            dt = time.time() - t0
            sps = len(train_set) / max(dt, 1e-9)
            if is_chief:
                print(f"epoch {epoch}: "
                      f"loss={metrics.get('loss_total', 0):.4f} "
                      f"({sps:.1f} samples/s)")
            if writer:
                for k, v in metrics.items():
                    writer.add_scalar(k, v, epoch + 1)
                writer.add_scalar("samples_per_sec", sps, epoch + 1)
            epoch_row = {"epoch": epoch, "samples_per_sec": round(sps, 4),
                         **{k: round(float(v), 4)
                            for k, v in metrics.items()}}

            # validate on the cadence AND at the last epoch: the exported
            # checkpoint must carry a validation pass (VERDICT r4 weak #4)
            if args.setting != "all" and len(val_set) > 0 and \
                    (epoch % args.val_every == 0 or epoch == args.epochs - 1):
                val_metrics = trainer.validate(iter(val_loader))
                print(f"epoch {epoch}: val_loss="
                      f"{val_metrics.get('val_loss_total', 0):.4f} "
                      f"val_ade={val_metrics.get('val_ade', 0):.3f} "
                      f"val_fde={val_metrics.get('val_fde', 0):.3f}")
                if writer:
                    for k, v in val_metrics.items():
                        writer.add_scalar(k, v, epoch + 1)
                epoch_row.update({k: round(float(v), 4)
                                  for k, v in val_metrics.items()})
                ade = val_metrics.get("val_ade")
                if ade is not None and (best_val_ade is None
                                        or ade < best_val_ade):
                    best_val_ade, best_epoch = float(ade), epoch + 1
                    if is_chief:
                        # Eager best-val inference export into its own
                        # model dir: a usable eval ensemble survives even
                        # if a later epoch or an async checkpoint save
                        # wedges the job (the round-5 flagship run died
                        # at the epoch-15 orbax save and had to be
                        # exported by hand, results/flagship_training_r5
                        # .json). A subdir keeps the final model_*.msgpack
                        # export from turning into a 2-member ensemble.
                        from .checkpoint import save_inference_weights
                        best_dir = os.path.join(logdir, "best")
                        os.makedirs(best_dir, exist_ok=True)
                        save_config_snapshot(best_dir, cfg)
                        save_inference_weights(
                            os.path.join(best_dir, "model_best.msgpack"),
                            {"params": trainer.state.params,
                             "batch_stats": trainer.state.batch_stats})
                        with open(os.path.join(best_dir,
                                               "EXPORT.json"), "w") as f:
                            json.dump({"epoch": epoch + 1,
                                       "val_ade": best_val_ade,
                                       "val_fde": float(
                                           val_metrics.get("val_fde", 0.0)),
                                       }, f, indent=1)

            # async: staging returns immediately, the write overlaps the
            # next epoch's training (AsyncCheckpointWriter)
            ckpt.save(epoch + 1, trainer.state)
            last_saved = epoch + 1
            history.append(epoch_row)
            if is_chief:
                with open(os.path.join(logdir, "history.json"), "w") as f:
                    json.dump({"best_val_ade": best_val_ade,
                               "best_epoch": best_epoch,
                               "per_epoch": history}, f, indent=1)
            epoch += 1
        except (KeyboardInterrupt, SystemExit):
            ckpt.close()
            raise
        except Exception as exc:
            from .elastic import write_error_file
            err_path = write_error_file(exc)
            restarts += 1
            if restarts > args.max_restarts:
                print(f"[elastic] epoch {epoch} failed; restart budget "
                      f"exhausted ({args.max_restarts}); error file at "
                      f"{err_path}")
                raise
            print(f"[elastic] epoch {epoch} failed "
                  f"({type(exc).__name__}: {exc}); restart "
                  f"{restarts}/{args.max_restarts}, error file {err_path}")
            if last_saved is not None:
                trainer.state = ckpt.restore(last_saved, trainer.state)
                print(f"[elastic] restored checkpoint epoch {last_saved}")
    if use_echo:
        if is_chief:
            print(f"[echo_cache] echo factor "
                  f"{train_loader.echo_factor:.2f} (consumed/refreshed)")
        train_loader.close()
    # Export final weights in the inference format HybridAgent loads —
    # the reference's model_%d.pth doubles as eval weights
    # (train.py:381-384 -> submission_agent.py:84-99); here training
    # checkpoints are orbax train-state dirs, so the eval-format export
    # is explicit.
    if is_chief:
        # params/batch_stats are replicated over the data axis, so the
        # chief's local view is the full tree (ZeRO-1 shards only the
        # optimizer moments, which the inference export drops).
        # Checkpoint SELECTION is by best val ADE when validation ran
        # (reference keeps every epoch and evaluates several,
        # README.md:113-172; here one eval-format file is exported so
        # the model dir stays a single-member ensemble).
        from .checkpoint import save_inference_weights
        export_epoch = epoch
        if best_epoch is not None and best_epoch != epoch:
            trainer.state = ckpt.restore(best_epoch, trainer.state)
            export_epoch = best_epoch
            print(f"exporting best-val_ade checkpoint: epoch "
                  f"{best_epoch} (val_ade {best_val_ade:.3f})")
        save_inference_weights(
            os.path.join(logdir, f"model_{export_epoch}.msgpack"),
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats})
    ckpt.close()  # drains any in-flight async save


if __name__ == "__main__":
    main()
