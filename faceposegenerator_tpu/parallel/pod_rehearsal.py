"""Multi-process pod rehearsal: the real-pod launch path, executable on CPU.

`__graft_entry__.dryrun_multichip` proves the sharded programs compile and
run over an n-device mesh, but it is ONE process — a real pod is N
processes (one per host), each seeing only its local chips, connected by
`jax.distributed.initialize`. This module rehearses exactly that topology
with separate OS processes on the CPU backend (Gloo collectives), so the
first real-pod run has a known-good launch script instead of a leap of
faith (VERDICT r3 "multi-host beyond CPU-mesh is untested").

What one rehearsal run proves, end to end:
  1. coordinator bring-up: N processes connect; `jax.devices()` becomes
     the global list (process-major), `jax.local_devices()` the host's.
  2. the ID-Booth train step (the reference's hot loop,
     `train_ID-Booth.py:994-1146`) jits over a global ("data", "model")
     mesh laid across processes — DP across hosts, TP across each host's
     local devices — and every process computes the IDENTICAL loss
     (multi-controller determinism).
  3. host-local data loading: each process materializes ONLY its
     `host_row_slice` of the global batch; `form_global_batch` assembles
     without cross-host transfers (the Accelerate-dataloader replacement,
     `train_ID-Booth.py:890-898`).
  4. rank-0-gated checkpointing to a shared directory + `barrier()` +
     all-process restore continues training bit-identically (the
     `accelerator.save_state` / `is_main_process` contract,
     `train_ID-Booth.py:1181-1206`).
  5. the data-parallel CFG sampler runs over the same mesh (serving path).

Usage (also wired as `cli pod-rehearsal`):
    python -m faceposegenerator_tpu.parallel.pod_rehearsal \
        --processes 2 --local_devices 2
On a real pod, run the same worker body with `init_distributed()`
auto-detection instead of explicit topology (see `core/dist.py`).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

PORT_DEFAULT = 18231


# --------------------------------------------------------------------------
# worker body — runs in EACH spawned process
# --------------------------------------------------------------------------

def run_worker(process_id: int, num_processes: int, local_devices: int,
               port: int, ckpt_dir: str) -> dict:
    """The per-host program. Returns the verdict dict it also prints."""
    # must precede any jax backend touch
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # workers compile IDENTICAL programs — share them via the persistent
    # cache (second worker and every re-run hit it instead of recompiling)
    from ..core.compile import machine_scoped_cache_dir

    jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..core.dist import (barrier, coordination_barrier, init_distributed,
                             is_coordinator)
    from ..core.dist import shutdown as dist_shutdown
    from ..core.mesh import form_global_batch, host_row_slice, make_mesh, replicate
    from ..core.precision import PARITY_POLICY
    from ..core.checkpointing import CheckpointManager
    from ..models import clip_text, iresnet, unet2d, vae
    from ..training import idbooth
    from .tp import shard_unet_params_tp

    info = init_distributed(
        f"localhost:{port}", num_processes=num_processes,
        process_id=process_id, platform="cpu",
    )
    assert info.process_count == num_processes, info
    assert info.local_device_count == local_devices, info

    # tiny configs (same family as dryrun_multichip — shapes shrink, the
    # program graph and sharding layout do not)
    bundle = idbooth.ModelBundle(
        text_cfg=clip_text.CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64,
        ),
        unet_cfg=unet2d.UNetConfig(
            block_out_channels=(32, 64, 64, 64), cross_attention_dim=32,
            head_dim=8,
        ),
        vae_cfg=vae.VAEConfig(block_out_channels=(32, 32, 32, 32)),
        arcface_cfg=iresnet.config_for("r18", num_features=64),
        attn_impl="reference",
    )
    ap_, ast_ = iresnet.init(jax.random.key(3), bundle.arcface_cfg)
    frozen = {
        "text_encoder": clip_text.init(jax.random.key(0), bundle.text_cfg),
        "unet": unet2d.init(jax.random.key(1), bundle.unet_cfg),
        "vae": vae.init(jax.random.key(2), bundle.vae_cfg),
        "arcface": {"params": ap_, "state": ast_},
    }
    cfg = idbooth.IDBoothConfig(which_loss="triplet_prior", resolution=64)
    trainable = idbooth.init_trainable(jax.random.key(4), cfg, bundle, frozen["unet"])
    opt = idbooth.make_optimizer(cfg, total_steps=8)
    opt_state = opt.init(trainable)
    step = idbooth.make_train_step(cfg, bundle, opt, policy=PARITY_POLICY, donate=False)

    # DP across processes, TP across each host's local devices:
    # jax.devices() is process-major, so reshape(num_processes, local) puts
    # the "data" axis across hosts and "model" within a host (TP collectives
    # stay on the fast intra-host fabric — ICI on a real pod).
    model_axis = local_devices if local_devices > 1 else 1
    mesh = make_mesh(model=model_axis)
    n_data = mesh.shape["data"]

    # host-local loading: generate the DETERMINISTIC global batch on every
    # host (fixed seeds), keep only this host's contiguous row slice — the
    # slice-concat contract host_row_slice pins
    rows = 2 * n_data
    gb = {
        "pixel_values": np.asarray(jax.random.uniform(
            jax.random.key(10), (rows, 64, 64, 3), minval=-1, maxval=1)),
        "input_ids": np.asarray(jax.random.randint(
            jax.random.key(11), (rows, 77), 0, 64)),
        "gt_embeds": np.asarray(jax.random.normal(
            jax.random.key(12), (rows, 64))),
    }
    # Establish every Gloo clique this body will use WHILE the processes
    # are aligned. Gloo context init has a fixed ~30 s key-value timeout,
    # paid per device-set (clique) at that clique's FIRST collective — which
    # normally fires right after each program's big jit compile, and compile
    # skew on an oversubscribed host exceeds 30 s (measured: 2- and
    # 4-process rehearsals died with "Gloo context initialization failed:
    # GetKeyValue() timed out" at the first train-step materialization even
    # with a pre-compile coordination barrier). Fix: AOT-compile tiny psums
    # over each mesh-axis combination (covers the per-column "data" cliques,
    # the intra-host "model" cliques, and the full-device clique every later
    # collective reuses), align on a control-plane barrier, THEN run them —
    # the KV exchanges happen milliseconds apart, and every subsequent
    # program (train step, allgather, sampler, rolling ticks, checkpoint
    # barrier) hits warm cliques regardless of its own compile skew.
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    warmups = []
    for axes in (("data",), ("model",), ("data", "model")):
        if any(mesh.shape[a] == 1 for a in axes):
            continue
        n = int(np.prod([mesh.shape[a] for a in axes]))
        spec = PartitionSpec(axes if len(axes) > 1 else axes[0])
        fn = jax.jit(
            shard_map(lambda x, a=axes: jax.lax.psum(x, a), mesh=mesh,
                      in_specs=(spec,), out_specs=spec),
            in_shardings=(NamedSharding(mesh, spec),),
        )
        # assemble the input from LOCAL shards — jax.device_put of a host
        # array onto a multi-process sharding runs its own assert_equal
        # allgather, which would be an unaligned collective before the
        # barrier (measured: it died with the very KV timeout this block
        # exists to prevent)
        host = np.ones((n,), np.float32)
        x = jax.make_array_from_callback(
            (n,), NamedSharding(mesh, spec), lambda idx: host[idx])
        warmups.append((fn.lower(x).compile(), x))
    coordination_barrier("pre_first_collective")
    for compiled, x in warmups:
        # local-shard fetch blocks: the clique KV exchange happens here
        np.asarray(compiled(x).addressable_data(0))

    sl = host_row_slice(rows, num_processes, process_id)
    batch = form_global_batch(mesh, {k: v[sl] for k, v in gb.items()})

    trainable = replicate(mesh, trainable)
    opt_state = replicate(mesh, opt_state)
    unet_params = frozen.pop("unet")
    # host copies for sample_2d_parallel below (it does its own placement)
    host_text, host_vae = frozen["text_encoder"], frozen["vae"]
    frozen = replicate(mesh, frozen)
    frozen["unet"] = (
        shard_unet_params_tp(unet_params, mesh, head_dim=bundle.unet_cfg.head_dim)
        if model_axis > 1 else replicate(mesh, unet_params)
    )

    t1, o1, m1 = step(trainable, opt_state, frozen, batch, jax.random.key(0))
    loss1 = float(m1["loss"])
    assert jnp.isfinite(loss1), f"non-finite loss {loss1}"

    # rank-0 checkpoint to the shared dir; everyone restores after a barrier
    mgr = CheckpointManager(ckpt_dir)
    if is_coordinator():
        # addressable-shard gather is enough here: trainable/opt are
        # replicated, so process 0's local view IS the full tree
        host_t1 = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), t1)
        host_o1 = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), o1)
        mgr.save(0, 1, host_t1, host_o1)
    barrier("ckpt_written")
    t1r, o1r, _ep, _st = mgr.restore(mgr.latest(), t1, o1)
    t1r, o1r = replicate(mesh, t1r), replicate(mesh, o1r)

    t2, o2, m2 = step(t1, o1, frozen, batch, jax.random.key(1))
    t2r, o2r, m2r = step(t1r, o1r, frozen, batch, jax.random.key(1))
    loss2, loss2r = float(m2["loss"]), float(m2r["loss"])
    assert jnp.isfinite(loss2)
    assert abs(loss2 - loss2r) < 1e-6, (
        f"checkpoint round-trip diverged across processes: {loss2} vs {loss2r}"
    )

    # every process must have computed identical losses (multi-controller
    # determinism) — allgather and compare on-device
    from jax.experimental import multihost_utils

    all_losses = np.asarray(multihost_utils.process_allgather(
        np.asarray([loss1, loss2], np.float32)))
    assert np.all(all_losses == all_losses[0]), all_losses

    # serving path: data-parallel CFG sampler over the same global mesh
    from ..diffusion import make_ddpm
    from ..diffusion.sampler import SamplerModels, sample_2d_parallel

    models = SamplerModels(
        text_cfg=bundle.text_cfg, unet_cfg=bundle.unet_cfg,
        vae_cfg=bundle.vae_cfg, attn_impl="reference",
    )
    sp = {"text_encoder": host_text, "unet": unet_params, "vae": host_vae}
    ids = np.asarray(jax.random.randint(jax.random.key(20), (n_data, 77), 0, 64))
    imgs = sample_2d_parallel(
        mesh, sp, make_ddpm(num_inference_steps=2), ids,
        np.zeros_like(ids), jax.random.key(21),
        models=models, height=64, width=64, policy=PARITY_POLICY,
    )
    img_mean = float(jnp.mean(imgs))
    assert imgs.shape == (n_data, 64, 64, 3) and jnp.isfinite(img_mean)

    # rolling-serving leg (VERDICT r4 #6): drive the RollingServer's tick
    # programs (`serving/rolling._admit/_tick/_decode1`) directly over the
    # SAME multi-process mesh with a deterministic admission schedule.
    # Multi-controller SPMD requires every process to issue identical
    # programs in lockstep — the threaded server admits on wall clock, so a
    # real pod deployment drives ticks from a coordinator-fixed schedule
    # exactly like this (slot 0 admitted at tick 0, the rest mid-flight at
    # tick 1 — the dirty-slot admission the single-process parity test in
    # tests/test_rolling.py covers).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..serving.rolling import _admit, _decode1, _tick

    def _pl(x, batch_dim=0):
        return jax.device_put(
            x, NamedSharding(mesh, P(*([None] * batch_dim + ["data"])))
        )

    S_r, B_r, h8 = 2, n_data, 64 // 8
    roll_sched = make_ddpm(num_inference_steps=S_r)
    ctx_dim = bundle.text_cfg.hidden_size
    ctx_buf = _pl(jnp.zeros((2 * B_r, 77, ctx_dim), jnp.float32))
    noise_buf = _pl(jnp.zeros((S_r + 1, B_r, h8, h8, 4), jnp.float32), batch_dim=1)
    latents = _pl(jnp.zeros((B_r, h8, h8, 4), jnp.float32))
    steps_host = [S_r] * B_r
    step_dev = _pl(jnp.asarray(steps_host, jnp.int32))
    static = dict(models=models, policy=PARITY_POLICY, S=S_r)
    for tick in range(S_r + 2):
        admit_now = [0] if tick == 0 else (list(range(1, B_r)) if tick == 1 else [])
        for slot in admit_now:
            ids = jnp.asarray(np.asarray(jax.random.randint(
                jax.random.key(30 + slot), (1, 77), 0, 64)))
            ctx_buf, noise_buf, latents = _admit(
                sp["text_encoder"], ids, jnp.zeros_like(ids),
                jnp.uint32(slot), jnp.int32(slot),
                ctx_buf, noise_buf, latents, None, jnp.float32(0.0),
                **static,
            )
            steps_host[slot] = 0
        if admit_now:
            step_dev = _pl(jnp.asarray(steps_host, jnp.int32))
        latents, step_dev = _tick(
            sp, roll_sched, latents, step_dev, ctx_buf, noise_buf,
            None, jnp.float32(1.0),
            guidance_scale=5.0, **static,
        )
        steps_host = [s + 1 if s < S_r else s for s in steps_host]
    assert all(s >= S_r for s in steps_host), steps_host
    lat0 = jax.device_put(latents[0], NamedSharding(mesh, P()))
    roll_img = np.asarray(_decode1(
        sp["vae"], lat0, models=models, policy=PARITY_POLICY))
    roll_mean = float(roll_img.mean())
    assert np.isfinite(roll_mean), roll_mean
    roll_all = np.asarray(multihost_utils.process_allgather(
        np.asarray([roll_mean], np.float32)))
    assert np.all(roll_all == roll_all[0]), roll_all

    barrier("done")
    verdict = {
        "process": process_id,
        "processes": num_processes,
        "global_devices": info.global_device_count,
        "mesh": {"data": int(n_data), "model": int(model_axis)},
        "loss1": loss1,
        "loss2": loss2,
        "loss2_restored": loss2r,
        "sample_mean": img_mean,
        "rolling_mean": roll_mean,
        "ok": True,
    }
    print("POD_REHEARSAL " + json.dumps(verdict), flush=True)
    # synchronized teardown: the atexit shutdown path raced on teardown
    # skew (4-process run died at the implicit shutdown barrier after
    # passing every leg) — see core/dist.shutdown
    dist_shutdown()
    return verdict


# --------------------------------------------------------------------------
# launcher — spawns the workers and cross-checks their verdicts
# --------------------------------------------------------------------------

def launch(num_processes: int, local_devices: int, port: int,
           timeout: float = 2400.0) -> dict:
    """Spawn `num_processes` worker processes on this host and verify all
    verdicts agree. Returns the merged verdict dict."""
    with tempfile.TemporaryDirectory() as ckpt_dir:
        # Each worker's merged stdout/stderr goes to a FILE, not a pipe:
        # with pipes, reading worker 0 first deadlocks when a later worker
        # fills the OS pipe buffer (JAX compile chatter) and blocks on
        # write inside a collective worker 0 is also in (ADVICE r4).
        procs, logs = [], []
        for i in range(num_processes):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # worker sets its own device count
            log = open(os.path.join(ckpt_dir, f"worker{i}.log"), "w+")
            logs.append(log)
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "faceposegenerator_tpu.parallel.pod_rehearsal",
                 "--worker", "--process_id", str(i),
                 "--processes", str(num_processes),
                 "--local_devices", str(local_devices),
                 "--port", str(port), "--ckpt_dir", ckpt_dir],
                stdout=log, stderr=subprocess.STDOUT,
                text=True, env=env,
            ))
        verdicts, outputs = [], []
        for p, log in zip(procs, logs):
            try:
                p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                for lg in logs:
                    lg.close()
                raise RuntimeError("pod rehearsal worker timed out")
            log.seek(0)
            out = log.read()
            log.close()
            outputs.append(out)
            for line in out.splitlines():
                if line.startswith("POD_REHEARSAL "):
                    verdicts.append(json.loads(line[len("POD_REHEARSAL "):]))
    if len(verdicts) != num_processes or any(p.returncode != 0 for p in procs):
        raise RuntimeError(
            "pod rehearsal failed:\n" + "\n----\n".join(outputs[-2:])
        )
    ref = verdicts[0]
    for v in verdicts[1:]:
        assert v["loss1"] == ref["loss1"] and v["loss2"] == ref["loss2"], verdicts
        assert v["global_devices"] == ref["global_devices"], verdicts
    merged = dict(ref)
    merged["process"] = "all"
    return merged


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--port", type=int, default=PORT_DEFAULT)
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--process_id", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--ckpt_dir", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="per-worker wall-clock budget (compile-heavy on a "
                         "contended host)")
    ap.add_argument("--out", default=None, help="write the merged verdict JSON here")
    args = ap.parse_args(argv)

    if args.worker:
        run_worker(args.process_id, args.processes, args.local_devices,
                   args.port, args.ckpt_dir)
        return 0

    verdict = launch(args.processes, args.local_devices, args.port,
                     timeout=args.timeout)
    print(json.dumps(verdict))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(verdict, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
