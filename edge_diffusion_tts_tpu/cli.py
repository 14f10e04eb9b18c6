"""Command-line entry point.

Reference behavior: edge_diffusion_tts/cli.py + root train.py — argparse
flags --config --resume --export --batch-size --epochs mapped onto the
training driver; extra subcommands cover the v2 recipe, benchmarking, and
HuBERT feature precomputation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="edge-tts-tpu",
        description="TPU-native Edge Diffusion TTS framework",
    )
    sub = p.add_subparsers(dest="command", required=False)

    t = sub.add_parser("train", help="3-phase training (reference train.py)")
    t.add_argument("--config", type=str, default=None, help="JSON config path")
    t.add_argument("--resume", type=str, default=None, help="checkpoint path")
    t.add_argument("--export", action="store_true", help="export StableHLO at end")
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--epochs", type=int, default=None, help="diffusion epochs")
    t.add_argument(
        "--phases", type=str, default="diffusion,progressive,consistency"
    )
    t.add_argument("--recipe", choices=["v1", "v2"], default="v1")
    t.add_argument(
        "--device", type=str, default=None,
        help="force JAX platform (tpu/gpu/cpu); reference cli.py --device",
    )
    t.add_argument(
        "--pipeline", type=int, default=None,
        help="stage the decoder backbone over N pipeline stages "
             "(overrides cfg.pipeline_stages)",
    )
    t.add_argument(
        "--mesh", type=str, default=None,
        help="data-parallel mesh shape, e.g. '8' or '8,1' (data, model); "
             "overrides cfg.mesh_shape",
    )

    b = sub.add_parser("bench", help="latency benchmark (see bench.py)")

    pre = sub.add_parser("precompute", help="precompute HuBERT features")
    pre.add_argument("root", type=str, help="LJSpeech root directory")
    pre.add_argument("--limit", type=int, default=None)

    g = sub.add_parser("generate", help="few-step sample generation (demo)")
    g.add_argument("checkpoint", type=str, help="edge_model_final directory")
    g.add_argument("--wav", type=str, default=None, help="reference wav path")
    g.add_argument("--steps", type=int, default=4)
    g.add_argument("--out", type=str, default="generated.wav")
    g.add_argument("--oracle", action="store_true",
                   help="wav->mel->GriffinLim round trip (vocoder error only)")
    g.add_argument("--post-filter", action="store_true")
    g.add_argument("--sampler", choices=["ddim", "dpmpp"], default="ddim",
                   help="dpmpp = 4-step DPM-Solver++ order 2 (v2 serving "
                        "sampler; requires a v-prediction model)")

    lf = sub.add_parser("longform", help="chunked long-audio generation")
    lf.add_argument("checkpoint", type=str)
    lf.add_argument("wav", type=str, help="input waveform to re-synthesize")
    lf.add_argument("--steps", type=int, default=50)
    lf.add_argument("--strength", type=float, default=0.6)
    lf.add_argument("--cfg-scale", type=float, default=2.0)
    lf.add_argument("--out", type=str, default="longform.wav")
    lf.add_argument(
        "--stream", action="store_true",
        help="stream waveform increments (generate_streaming_audio): the "
             "output file grows as chunks finalize; prints per-increment "
             "latency incl. time-to-first-audio",
    )

    ex = sub.add_parser(
        "export", help="export the decoder for edge deployment"
    )
    ex.add_argument("checkpoint", type=str, help="edge_model_final directory")
    ex.add_argument("--format", choices=["stablehlo", "tflite", "weight-int8"],
                    default="stablehlo")
    ex.add_argument("--out", type=str, default=None)
    ex.add_argument("--t-frames", type=int, default=200,
                    help="static mel length (tflite only)")
    ex.add_argument("--s-tokens", type=int, default=100,
                    help="static context length (tflite only)")
    ex.add_argument("--quantize", choices=["dynamic", "int8"], default="",
                    help="post-training quantization (tflite only); for the "
                         "in-budget selective weight-only artifact use "
                         "--format weight-int8 (utils/quantize.py)")

    sv = sub.add_parser(
        "serve",
        help="micro-batched TCP serving (line-JSON protocol, serving.py)",
    )
    sv.add_argument("checkpoint", type=str, help="edge_model_final directory")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=7455)
    sv.add_argument("--steps", type=int, default=None,
                    help="denoise steps (default cfg.inference_steps)")
    sv.add_argument("--buckets", type=str, default="128,256,512,1024",
                    help="token-length buckets (one compiled program each)")
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--max-wait-ms", type=float, default=5.0)
    sv.add_argument("--max-queue-delay-ms", type=float, default=None,
                    help="SLO bound: shed (reject) submits whose predicted "
                         "queueing delay exceeds this; bounds the p99 tail "
                         "at saturation")
    sv.add_argument("--sampler", choices=["ddim", "dpmpp"], default="ddim")
    sv.add_argument("--mesh", type=int, default=0,
                    help="shard each batch over N chips on the data axis "
                         "(max-batch must be divisible by N)")
    sv.add_argument("--seed", type=int, default=0,
                    help="base PRNG seed; sampling noise is a fresh fold "
                         "of it per device batch")
    sv.add_argument("--compile-cache", type=str, default=None,
                    help="persistent XLA compilation-cache dir: server "
                         "restarts reuse the per-bucket programs instead of "
                         "recompiling at warmup")
    sv.add_argument("--longform", action="store_true",
                    help="also serve streaming long-form requests "
                         "({'longform': ...} protocol lines): wav in, "
                         "finalized mel/waveform increments streamed out")
    sv.add_argument("--longform-streams", type=int, default=4,
                    help="max concurrent long-form streams batched into one "
                         "device program per chunk tick (with --longform)")
    sv.add_argument("--chunk-seconds", type=float, default=2.0,
                    help="long-form chunk length (with --longform)")
    sv.add_argument("--overlap-seconds", type=float, default=0.5,
                    help="long-form chunk overlap (with --longform)")
    sv.add_argument("--longform-prep-buckets", type=str, default="8,16,32,64",
                    help="comma-separated SECONDS the long-form stream prep "
                         "pads to (one compiled program per bucket instead "
                         "of one per wav length; exact via the masked "
                         "HuBERT forward). Empty string disables bucketing")

    mg = sub.add_parser(
        "migrate", help="convert a PyTorch-reference .pt checkpoint"
    )
    mg.add_argument("pt_path", type=str, help="edge_model_final.pt / best_model.pt")
    mg.add_argument("out_dir", type=str, help="output checkpoint directory")
    mg.add_argument("--hubert-id", type=str, default=None,
                    help="HF model id to fill the frozen HuBERT subtree")

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .config import CFG

    if args.command in (None, "train"):
        if getattr(args, "device", None):
            # Must run before the first backend touch (see config.get_device).
            import jax

            jax.config.update("jax_platforms", args.device)
        cfg = CFG()
        if getattr(args, "config", None):
            with open(args.config) as f:
                cfg = CFG.from_dict(json.load(f))
        if getattr(args, "batch_size", None):
            cfg.batch_size = args.batch_size
        if getattr(args, "epochs", None):
            cfg.diffusion_epochs = args.epochs
        if getattr(args, "device", None):
            cfg.device = args.device
        if getattr(args, "mesh", None):
            shape = [int(s) for s in args.mesh.split(",")]
            if len(shape) == 1:
                shape.append(1)
            cfg.mesh_shape = shape
        if getattr(args, "pipeline", None):
            cfg.pipeline_stages = args.pipeline

        from .training import train, train_v2

        # getattr defaults: bare `edge-tts-tpu` (command None) reaches here
        # with a namespace that has none of the train subparser's attributes.
        resume = getattr(args, "resume", None)
        export = getattr(args, "export", False)
        if getattr(args, "recipe", "v1") == "v2":
            train_v2(cfg, resume=resume, export=export)
        else:
            phases = [
                s for s in getattr(
                    args, "phases", "diffusion,progressive,consistency"
                ).split(",") if s
            ]
            train(cfg, resume=resume, export=export, phases=phases)

    elif args.command == "bench":
        import runpy

        # bench.py lives at the repo root (not packaged): resolve relative
        # to the package so the subcommand works from any CWD of a source
        # checkout, and fail with a pointer otherwise.
        bench_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        )
        if not os.path.exists(bench_path):
            raise SystemExit(
                "bench.py is part of the source checkout, not the installed "
                "package — run `python bench.py` from the repo root"
            )
        runpy.run_path(bench_path, run_name="__main__")

    elif args.command == "generate":
        from .demo import generate_sample

        generate_sample(
            args.checkpoint,
            wav_path=args.wav,
            num_steps=args.steps,
            out_path=args.out,
            oracle=args.oracle,
            post_filter=args.post_filter,
            sampler=args.sampler,
        )

    elif args.command == "longform":
        import jax
        import numpy as np
        from scipy.io import wavfile

        from .data import load_wav, resample_np
        from .models import EdgeDiffusionDecoder, SemanticEncoder
        from .pipeline import LongFormPipeline
        from .schedule import DiffusionSchedule
        from .training.checkpoint import (
            encoder_variables,
            restore_final_model,
            restore_hubert_config,
        )

        params, cfg = restore_final_model(args.checkpoint)
        wav, sr = load_wav(args.wav)
        if sr != cfg.sample_rate:
            wav = resample_np(wav, sr, cfg.sample_rate)

        hubert_cfg = restore_hubert_config(args.checkpoint)
        encoder = SemanticEncoder(cfg, hubert_cfg)
        decoder = EdgeDiffusionDecoder(cfg)
        pipe = LongFormPipeline(
            cfg,
            DiffusionSchedule.create(cfg.diff_steps),
            lambda p, x, t, **kw: decoder.apply({"params": p}, x, t, **kw),
            params["decoder"],
            # encoder_variables threads the saved VQ codebook (vq_state)
            # for use_fsq=False checkpoints.
            encoder_apply=lambda variables, w, **kw: encoder.apply(
                variables, w, train=False, **kw
            )[0],
            encoder_params=encoder_variables(params),
            sem_stride=hubert_cfg.total_stride,
        )
        if args.stream:
            # Live-serving path: append ONLY each increment's PCM bytes and
            # patch the two RIFF size fields in place, so per-increment work
            # is O(increment) and the file is playable at every moment.
            import struct
            import time as _time

            sr = cfg.sample_rate
            n_bytes, first = 0, True
            t0 = _time.time()
            with open(args.out, "wb+") as f:
                f.write(
                    b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                    + b"data" + struct.pack("<I", 0)
                )
                for inc, offset in pipe.generate_streaming_audio(
                    wav, steps=args.steps, strength=args.strength,
                    cfg_scale=args.cfg_scale,
                ):
                    pcm = (
                        np.clip(inc, -1, 1) * 32767
                    ).astype("<i2").tobytes()
                    f.seek(0, 2)
                    f.write(pcm)
                    n_bytes += len(pcm)
                    f.seek(4)
                    f.write(struct.pack("<I", 36 + n_bytes))
                    f.seek(40)
                    f.write(struct.pack("<I", n_bytes))
                    f.flush()
                    dt = _time.time() - t0
                    tag = "first audio" if first else "increment"
                    first = False
                    print(
                        f"  {tag}: +{inc.shape[0] / sr:.2f}s audio "
                        f"at t={dt:.2f}s (offset {offset / sr:.2f}s)"
                    )
        else:
            _, out = pipe.generate(
                wav, steps=args.steps, strength=args.strength,
                cfg_scale=args.cfg_scale,
            )
            wavfile.write(args.out, cfg.sample_rate,
                          (np.clip(out, -1, 1) * 32767).astype(np.int16))
        print(f"wrote {args.out}")

    elif args.command == "serve":
        import jax

        if args.compile_cache:
            # Must be set before the first compile (run_server's warmup).
            jax.config.update("jax_compilation_cache_dir", args.compile_cache)

        from .serving import run_server

        try:
            server, batcher = run_server(
                args.checkpoint,
                host=args.host,
                port=args.port,
                steps=args.steps,
                buckets=tuple(int(b) for b in args.buckets.split(",")),
                max_batch=args.max_batch,
                max_wait_ms=args.max_wait_ms,
                max_queue_delay_ms=args.max_queue_delay_ms,
                sampler=args.sampler,
                mesh=args.mesh,
                seed=args.seed,
                longform=args.longform,
                longform_streams=args.longform_streams,
                chunk_seconds=args.chunk_seconds,
                overlap_seconds=args.overlap_seconds,
                longform_prep_buckets=tuple(
                    float(s) for s in args.longform_prep_buckets.split(",") if s
                ),
            )
        except ValueError as e:
            raise SystemExit(str(e))
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            server.shutdown()
            batcher.close()

    elif args.command == "export":
        from .models import EdgeDiffusionDecoder
        from .training.checkpoint import restore_final_model

        params, cfg = restore_final_model(args.checkpoint)
        decoder = EdgeDiffusionDecoder(cfg)
        if args.format == "weight-int8":
            # Selective per-channel weight-only int8: the quantization mode
            # that meets the 1e-2 e2e mel-L1 budget (sensitive tensors kept
            # f32; see utils/quantize.py and QUANT_r04.json).
            import json as _json

            from .utils.quantize import save_quantized

            out = args.out or "edge_model.int8.npz"
            final, report = save_quantized(out, params["decoder"])
            print(_json.dumps(report))
            print(f"Exported weight-int8 decoder -> {final}")
        elif args.format == "tflite":
            from .utils.export import export_tflite

            out = args.out or "edge_model.tflite"
            export_tflite(
                cfg, decoder, params["decoder"], out,
                t_frames=args.t_frames, s_tokens=args.s_tokens,
                quantize=args.quantize,
            )
        else:
            from .utils.export import export_for_edge

            out = args.out or "edge_model.stablehlo"
            export_for_edge(cfg, decoder, params["decoder"], out)

    elif args.command == "migrate":
        import torch

        from .training.checkpoint import save_final_model
        from .utils.torch_compat import convert_reference_checkpoint

        ckpt = torch.load(args.pt_path, map_location="cpu", weights_only=False)
        cfg = CFG.from_dict(ckpt["cfg"]) if ckpt.get("cfg") else CFG()
        hubert_params = None
        if args.hubert_id:
            from transformers import HubertModel

            from .models.hubert import HubertConfig as HC
            from .models.hubert import load_hubert_params_from_torch

            hm = HubertModel.from_pretrained(args.hubert_id)
            hubert_params = load_hubert_params_from_torch(hm.state_dict(), HC())
        params, vq_state, cfg_dict = convert_reference_checkpoint(
            ckpt, num_layers=cfg.layers, hubert_params=hubert_params
        )
        if cfg_dict:
            # The converter sanitizes reference-only config quirks (e.g.
            # the declared-but-unconsumed use_depthwise=True).
            cfg = CFG.from_dict(cfg_dict)
        # vq_state carries the trained VQ codebook for use_fsq=False
        # reference checkpoints — dropping it would leave token encoding
        # on a random-init codebook.
        save_final_model(args.out_dir, params, cfg, vq_state=vq_state or None)
        if not hubert_params:
            print("NOTE: no --hubert-id given; the frozen HuBERT subtree is "
                  "absent — fill it before running inference.")
        print(f"migrated {args.pt_path} -> {args.out_dir}")

    elif args.command == "precompute":
        import jax

        from .config import CFG
        from .data import precompute_hubert_features
        from .models import HubertEncoder

        cfg = CFG()
        hubert = HubertEncoder()
        params = hubert.init(
            jax.random.PRNGKey(0), jax.numpy.zeros((1, 4000))
        )
        apply = jax.jit(
            lambda p, wav: hubert.apply(p, wav, method=hubert.extract_layer,
                                        layer=cfg.hubert_layer)
        )
        print(
            "WARNING: random-init HuBERT; pass converted weights for real use",
            file=sys.stderr,
        )
        precompute_hubert_features(args.root, apply, params, limit=args.limit)


if __name__ == "__main__":
    main()
