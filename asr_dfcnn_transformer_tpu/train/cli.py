"""Command-line entry points.

The user surface matching the reference's drivers (``README.md:11-14``):

    python -m asr_dfcnn_transformer_tpu.train.cli am    --workdir W [...]
    python -m asr_dfcnn_transformer_tpu.train.cli lm    --workdir W [...]
    python -m asr_dfcnn_transformer_tpu.train.cli atten --workdir W [...]
    python -m asr_dfcnn_transformer_tpu.train.cli e2e   --workdir W [...]
    python -m asr_dfcnn_transformer_tpu.train.cli eval  --workdir W [...]
    python -m asr_dfcnn_transformer_tpu.train.cli infer --workdir W --wav f.wav

replacing ``lm_and_am/train.py`` (AM+LM), ``train_atten.py``
(CTC-attention), ``end2end/model.py`` (speech transformer), ``test.py``
(pipeline eval) and ``read_wav.py`` (single-file/streaming inference).
Beyond the reference's surface: ``export`` (weights back to the TF1/hdf5
formats), ``export-serving`` (one-file jax.export serving artifact),
``infer-artifact`` (recognition from that artifact alone) and ``serve``
(micro-batched HTTP recognition endpoint, live or artifact-backed).
Unlike the reference's argparse-at-import classes (hparams.py:34,53,72,91)
flags are parsed once here into the dataclass config tree.

``--synthetic N`` fabricates a tone corpus on the fly so every command runs
end-to-end without the five Mandarin corpora on disk.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp


def _build_parser():
    p = argparse.ArgumentParser(prog="asr-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, workdir_required=True):
        sp.add_argument("--workdir", required=workdir_required,
                        default=None)
        sp.add_argument("--data-dir", default=None)
        sp.add_argument("--speech-root", default=None)
        sp.add_argument("--noise-root", default="")
        sp.add_argument("--corpora", default="thchs,aishell,aidatatang,stcmd,prime")
        sp.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic utterances instead of "
                             "reading real manifests")
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--epochs", type=int, default=None)
        sp.add_argument("--lr", type=float, default=None)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--small", action="store_true",
                        help="tiny model dims (tests / smoke)")
        sp.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu)")
        sp.add_argument("--distributed", action="store_true",
                        help="multi-host run: call "
                             "jax.distributed.initialize() before any jax "
                             "use. On TPU pods the coordinator/process "
                             "count/process id are auto-detected; "
                             "elsewhere pass the three flags below. The "
                             "(data, model) mesh then spans all hosts' "
                             "devices, with collectives over ICI.")
        sp.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (non-TPU-pod envs)")
        sp.add_argument("--num-processes", type=int, default=None)
        sp.add_argument("--process-id", type=int, default=None)
        sp.add_argument("--config", default=None,
                        help="JSON config-tree file (core.config.Config; "
                             "see train.factory.config_to_json). CLI flags "
                             "override its values; the resolved config is "
                             "written to <workdir>/config.json")
        sp.add_argument("--force-model-mismatch", action="store_true",
                        help="restore a checkpoint whose stamped "
                             "architecture differs STRUCTURALLY from the "
                             "requested model (train/identity.py). "
                             "Without this flag such restores fail "
                             "loudly — a same-shaped param tree under a "
                             "different architecture silently computes "
                             "a different function")

    for name in ("am", "lm", "atten", "e2e", "joint", "eval", "eval-lm",
                 "eval-e2e", "eval-atten"):
        sp = sub.add_parser(name)
        common(sp)
        if name in ("am", "eval"):
            sp.add_argument("--model", default="se_dfcnn",
                            choices=["dfcnn", "se_dfcnn", "se_dfcnn_pre",
                                     "se_dfcnn_fast", "keras_dfcnn",
                                     "bigru"],
                            help="acoustic model architecture; eval must "
                                 "match what `am` trained (e.g. "
                                 "se_dfcnn_fast, the ~2.1x-faster "
                                 "space-to-depth training variant)")
            sp.add_argument("--logits-matmul", default="f32",
                            choices=["f32", "bf16"],
                            help="final vocab-projection matmul: f32 "
                                 "(reference numerics) or bf16 operands "
                                 "with f32 accumulation (~4x MXU rate; "
                                 "same parameter tree, checkpoints "
                                 "interchangeable)")
        if name == "am":
            sp.add_argument("--augment-noise", action="store_true")
        if name in ("am", "e2e"):
            sp.add_argument("--augment-spec", action="store_true",
                            help="SpecAugment time/freq masking inside "
                                 "the jitted train step (beyond "
                                 "reference; audio/specaugment.py — for "
                                 "e2e it masks the fbank features before "
                                 "LFR stacking)")
        if name in ("am", "lm", "atten", "e2e", "joint"):
            sp.add_argument("--tensorboard", action="store_true",
                            help="also write TensorBoard event files to "
                                 "<workdir>/tb/<name> (clean-room writer, "
                                 "utils/tb_events.py; reference parity "
                                 "with lm_and_am/train.py:51-53 — e2e "
                                 "additionally dumps per-epoch attention "
                                 "images, end2end/transformer.py:105-106)")
        if name in ("eval", "eval-e2e"):
            sp.add_argument("--decode", default="greedy",
                            choices=["greedy", "beam"])
            sp.add_argument("--beam-width", type=int, default=8)
            sp.add_argument("--limit", type=int, default=None)
        if name == "eval":
            sp.add_argument("--am-hdf5", default=None,
                            help="load the acoustic model from a Keras "
                                 ".hdf5 weight file instead of an orbax "
                                 "checkpoint (cnn_ctc layout, e.g. the "
                                 "reference's model_05.7.64.hdf5 — or the "
                                 "cnn_rnn_ctc layout with --model bigru)")
            sp.add_argument("--am-tf-ckpt", default=None,
                            help="load the SE-DFCNN acoustic model from a "
                                 "TF1 tensor_bundle checkpoint prefix (the "
                                 "reference's graph-mode Saver files, "
                                 "train.py:38) instead of an orbax "
                                 "checkpoint")
        if name in ("eval", "eval-lm"):
            sp.add_argument("--lm-tf-ckpt", default=None,
                            help="load the Transformer LM from a TF1 "
                                 "tensor_bundle checkpoint prefix (the "
                                 "reference's logs_lm Saver files, "
                                 "train.py:148) instead of an orbax "
                                 "checkpoint")

    sp = sub.add_parser("infer")
    common(sp)
    sp.add_argument("--wav", required=True)
    sp.add_argument("--decode", default="greedy", choices=["greedy", "beam"])
    sp.add_argument("--model", default="se_dfcnn",
                    choices=["dfcnn", "se_dfcnn", "se_dfcnn_pre",
                             "se_dfcnn_fast", "keras_dfcnn", "bigru"])
    sp.add_argument("--streaming", action="store_true",
                    help="decode incrementally (IncrementalRecognizer): "
                         "feed the wav in chunks, print a partial "
                         "hypothesis per chunk, then the final — O(chunk) "
                         "per push instead of re-decoding the buffer")
    sp.add_argument("--chunk-seconds", type=float, default=1.28,
                    help="streaming push size in seconds")

    sp = sub.add_parser(
        "export", help="export the trained AM back to the reference's "
                       "checkpoint formats")
    sp.add_argument("--workdir", required=True)
    sp.add_argument("--out", required=True,
                    help="output path (tf1: checkpoint prefix; "
                         "hdf5: .hdf5 file)")
    sp.add_argument("--format", default="tf1", choices=["tf1", "hdf5"],
                    help="tf1 = tensor_bundle (Saver) files for SE-DFCNN "
                         "(--what am) or the Transformer LM (--what lm); "
                         "hdf5 = Keras cnn_ctc weights (keras_dfcnn only) "
                         "or cnn_rnn_ctc weights (--what bigru)")
    sp.add_argument("--what", default="am", choices=["am", "lm", "bigru"],
                    help="which trained model to export: the acoustic "
                         "model (am, default), the language model (lm, "
                         "tf1 only), or a keras_parity BiGRU AM (bigru, "
                         "hdf5 only)")
    sp.add_argument("--use-latest", action="store_true",
                    help="export the latest checkpoint instead of the "
                         "metric-gated best")
    sp.add_argument("--platform", default=None)

    sp = sub.add_parser(
        "export-serving",
        help="serialize the fused AM->LM inference program + weights + "
             "vocabs into ONE self-contained artifact (jax.export "
             "StableHLO) servable without model code or checkpoints")
    common(sp)
    sp.add_argument("--out", required=True, help="artifact path (.asrx)")
    sp.add_argument("--what", default="pipeline",
                    choices=["pipeline", "e2e"],
                    help="pipeline = fused AM->LM (ServingPipeline); "
                         "e2e = SpeechTransformer encoder + KV-cached AR "
                         "decode (E2EServing)")
    sp.add_argument("--model", default="se_dfcnn",
                    choices=["dfcnn", "se_dfcnn", "se_dfcnn_pre",
                             "se_dfcnn_fast", "keras_dfcnn", "bigru"])
    sp.add_argument("--decode", default="greedy",
                    choices=["greedy", "beam"])
    sp.add_argument("--beam-width", type=int, default=8)
    sp.add_argument("--no-lm", action="store_true",
                    help="pipeline artifact without the LM stage "
                         "(pinyin-only; no ckpt_lm needed)")
    sp.add_argument("--use-latest", action="store_true",
                    help="export the latest checkpoint instead of the "
                         "metric-gated best")
    sp.add_argument("--serve-batch-sizes", default="1,8",
                    help="comma-separated batch sizes to export entry "
                         "points for")
    sp.add_argument("--serve-buckets", default="128,512,1600",
                    help="comma-separated bucket_frames (multiples of 8)")
    sp.add_argument("--serve-platforms", default=None,
                    help="comma-separated lowering platforms (e.g. "
                         "'cpu,tpu' builds one artifact for both from "
                         "any host); default: the exporting machine's "
                         "backend, which embeds its auto-selected "
                         "kernels")

    sp = sub.add_parser(
        "infer-artifact",
        help="recognize a wav from a serving artifact alone — no "
             "workdir, checkpoints or assets")
    sp.add_argument("--artifact", required=True, help=".asrx path")
    sp.add_argument("--wav", required=True)
    sp.add_argument("--platform", default=None)

    sp = sub.add_parser(
        "serve",
        help="HTTP recognition endpoint (infer/http_server.py): POST a "
             "PCM wav to /v1/recognize. Backed by the micro-batching "
             "BatchingServer over a live workdir pipeline, or by an AOT "
             "serving artifact (--artifact; no checkpoints needed)")
    common(sp, workdir_required=False)
    sp.add_argument("--artifact", default=None,
                    help="serve a .asrx artifact instead of workdir "
                         "checkpoints")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8000,
                    help="0 = pick a free port (printed on startup)")
    sp.add_argument("--model", default="se_dfcnn",
                    choices=["dfcnn", "se_dfcnn", "se_dfcnn_pre",
                             "se_dfcnn_fast", "keras_dfcnn", "bigru"])
    sp.add_argument("--decode", default="greedy",
                    choices=["greedy", "beam"])
    sp.add_argument("--beam-width", type=int, default=8)
    sp.add_argument("--max-batch", type=int, default=16,
                    help="rows per coalesced device batch (live backend)")
    sp.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="batching window after the first pending request")
    sp.add_argument("--max-requests", type=int, default=None,
                    help="exit after N recognitions (smoke tests)")
    sp.add_argument("--streams", type=int, default=0,
                    help="max concurrent /v1/stream sessions (StreamPool-"
                         "batched incremental recognition; 0 = disabled; "
                         "live backend only)")
    sp.add_argument("--stream-idle-timeout", type=float, default=600.0,
                    help="seconds of inactivity before a stream's slot "
                         "is reclaimed")
    return p


def _setup_platform(args):
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "distributed", False):
        # Multi-host: one controller process per host (SPMD). Must run
        # before any backend initializes so every process sees the global
        # device set; the trainers' make_mesh() then lays the (data, model)
        # mesh over jax.devices() across hosts. The reference has no
        # multi-host story (single tf.Session, SURVEY.md §2.3); this is
        # the TPU-native replacement for what NCCL/Horovod would be.
        kwargs = {}
        if args.coordinator_address:
            kwargs.update(coordinator_address=args.coordinator_address,
                          num_processes=args.num_processes,
                          process_id=args.process_id)
        jax.distributed.initialize(**kwargs)
        print(f"[distributed] process {jax.process_index()}/"
              f"{jax.process_count()}, local devices "
              f"{len(jax.local_devices())}, global {len(jax.devices())}",
              flush=True)


def _apply_config(args):
    """Merge a JSON config tree into unset CLI args and snapshot the
    resolved config into the workdir for reproducibility."""
    import dataclasses

    from asr_dfcnn_transformer_tpu.core.config import Config
    from asr_dfcnn_transformer_tpu.train.factory import (
        config_from_json, config_to_json)

    if getattr(args, "config", None):
        with open(args.config, encoding="utf-8") as f:
            cfg = config_from_json(f.read())
    else:
        cfg = Config()
    # CLI flags win; config fills the gaps
    if args.lr is None and args.cmd in ("am", "atten", "joint"):
        args.lr = cfg.am.lr
    if args.lr is None and args.cmd == "lm":
        args.lr = cfg.lm.lr
    if args.lr is None and args.cmd == "e2e":
        args.lr = cfg.e2e.lr
    if args.batch_size is None:
        args.batch_size = {"am": cfg.am.batch_size,
                           "lm": cfg.lm.batch_size,
                           "e2e": cfg.e2e.batch_size}.get(args.cmd)
    if args.epochs is None:
        args.epochs = cfg.train.epochs
    if getattr(args, "model", None) is None and args.cmd == "am":
        args.model = cfg.am.model
    os.makedirs(args.workdir, exist_ok=True)
    # record the effective config next to the checkpoints — but only for
    # TRAINING commands: eval/infer resolve defaults too, and writing
    # their (default) config would clobber the record of what training
    # actually used
    if args.cmd in ("am", "lm", "atten", "e2e", "joint"):
        eff = cfg
        if args.cmd == "am" and args.lr is not None:
            eff = eff.replace(
                am=dataclasses.replace(eff.am, lr=args.lr,
                                       batch_size=args.batch_size
                                       or eff.am.batch_size))
        with open(os.path.join(args.workdir, "config.json"), "w",
                  encoding="utf-8") as f:
            f.write(config_to_json(eff))
    return cfg


def _data(args, batch_size, bucket_bounds=(400, 800, 1200, 1600),
          e2e_vocab: bool = False):
    from asr_dfcnn_transformer_tpu.core import vocab
    from asr_dfcnn_transformer_tpu.data import (
        DataLoader, load_manifests, make_synthetic_corpus)

    if args.synthetic:
        root = os.path.join(args.workdir, "synthetic")
        data_dir, wav_root, _, _ = make_synthetic_corpus(
            root, num_utts=args.synthetic, num_classes=8, seed=args.seed)
        corpora = ("thchs",)
    else:
        data_dir, wav_root = args.data_dir, args.speech_root
        corpora = tuple(args.corpora.split(","))
        if data_dir is None:
            sys.exit("--data-dir required (or use --synthetic N)")
    av = vocab.acoustic_vocab()
    # the e2e model's hanzi id space has pad/sos/eos FIRST (6347,
    # end2end/data_loader.py:324-333) — chars shift by +2 vs the LM vocab
    lv = vocab.e2e_language_vocab() if e2e_vocab else vocab.language_vocab()

    def loader(mode, shuffle):
        m = load_manifests(data_dir, mode, corpora=corpora, shuffle=shuffle,
                           seed=args.seed)
        return DataLoader(m, av, lv, speech_root=wav_root,
                          noise_root=args.noise_root,
                          bucket_bounds=bucket_bounds)

    return loader, av, lv


def _am_model(name, vocab_size, small, dtype=jnp.bfloat16,
              logits_matmul="f32"):
    from asr_dfcnn_transformer_tpu import models
    lg = {"logits_matmul": logits_matmul}
    if small:
        kw = dict(dtype=jnp.float32, **lg)
        if name in ("dfcnn",):
            return models.DFCNN(vocab_size, **kw)
        if name == "bigru":
            return models.BiGRUCTC(vocab_size, hidden=32, num_layers=1,
                                   dtype=jnp.float32, **lg)
        if name == "keras_dfcnn":
            return models.KerasDFCNN(vocab_size, dense_units=16, **kw)
        return models.SEDFCNN(vocab_size, stage_features=(4, 4, 8, 8, 8),
                              head_features=8,
                              se_first=(name == "se_dfcnn_pre"), **kw)
    if name == "dfcnn":
        return models.DFCNN(vocab_size, dtype=dtype, **lg)
    if name == "bigru":
        return models.BiGRUCTC(vocab_size, dtype=dtype, **lg)
    if name == "keras_dfcnn":
        return models.KerasDFCNN(vocab_size, dtype=dtype, **lg)
    if name == "se_dfcnn_fast":
        return models.SEDFCNN.fast(vocab_size, dtype=dtype, **lg)
    return models.SEDFCNN(vocab_size, se_first=(name == "se_dfcnn_pre"),
                          dtype=dtype, **lg)


def _lm_model(av_size, lv_size, small):
    from asr_dfcnn_transformer_tpu.models import TransformerLM
    if small:
        return TransformerLM(av_size, lv_size, d_model=32, num_heads=4,
                             num_blocks=1, dropout_rate=0.0,
                             dtype=jnp.float32)
    return TransformerLM(av_size, lv_size)


def cmd_am(args):
    from asr_dfcnn_transformer_tpu.data.loader import prefetch
    from asr_dfcnn_transformer_tpu.train import AMTrainer
    bsz = args.batch_size or 16
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, lv = _data(args, bsz, bounds)
    train_dl, dev_dl = loader("train", True), loader("dev", False)
    model = _am_model(args.model, av.size, args.small,
                      logits_matmul=getattr(args, "logits_matmul", "f32"))
    tr = AMTrainer(model, args.workdir, lr=args.lr or 7e-4,
                   augment_noise=args.augment_noise,
                   augment_spec=getattr(args, "augment_spec", False))
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    if getattr(args, "tensorboard", False):
        tr.enable_tensorboard()
    first = next(train_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(
        jax.random.PRNGKey(args.seed), first))
    out = tr.fit(lambda: prefetch(train_dl.am_batches(bsz, seed=args.seed)),
                 lambda: dev_dl.am_batches(bsz, shuffle=False),
                 epochs=args.epochs or 100,
                 rng=jax.random.PRNGKey(args.seed))
    print("am training done:", out)


def cmd_lm(args):
    from asr_dfcnn_transformer_tpu.data.loader import prefetch
    from asr_dfcnn_transformer_tpu.train import LMTrainer
    bsz = args.batch_size or 64
    loader, av, lv = _data(args, bsz)
    train_dl, dev_dl = loader("train", True), loader("dev", False)
    model = _lm_model(av.size, lv.size, args.small)
    tr = LMTrainer(model, args.workdir, lr=args.lr or 5e-5)
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    if getattr(args, "tensorboard", False):
        tr.enable_tensorboard()
    first = next(train_dl.lm_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(
        jax.random.PRNGKey(args.seed), first))
    out = tr.fit(lambda: prefetch(train_dl.lm_batches(bsz, seed=args.seed)),
                 lambda: dev_dl.lm_batches(bsz, shuffle=False),
                 epochs=args.epochs or 100,
                 rng=jax.random.PRNGKey(args.seed))
    print("lm training done:", out)


def cmd_atten(args):
    """CTC-attention: LFR fbank -> hanzi CTC (train_atten.py capability)."""
    from asr_dfcnn_transformer_tpu.data.loader import prefetch
    from asr_dfcnn_transformer_tpu.models import CTCAttention
    from asr_dfcnn_transformer_tpu.train.trainer import AttenTrainer
    bsz = args.batch_size or 16
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, lv = _data(args, bsz, bounds)
    train_dl, dev_dl = loader("train", True), loader("dev", False)
    if args.small:
        model = CTCAttention(lv.size, d_model=32, num_heads=4, num_blocks=1,
                             dropout_rate=0.0, dtype=jnp.float32)
    else:
        model = CTCAttention(lv.size)
    tr = AttenTrainer(model, args.workdir, lr=args.lr or 7e-4)
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    if getattr(args, "tensorboard", False):
        tr.enable_tensorboard()
    first = next(train_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(
        jax.random.PRNGKey(args.seed), first))
    out = tr.fit(lambda: prefetch(train_dl.am_batches(bsz, seed=args.seed)),
                 lambda: dev_dl.am_batches(bsz, shuffle=False),
                 epochs=args.epochs or 100,
                 rng=jax.random.PRNGKey(args.seed))
    print("ctc-attention training done:", out)


def cmd_e2e(args):
    from asr_dfcnn_transformer_tpu.data.loader import prefetch
    from asr_dfcnn_transformer_tpu.models import SpeechTransformer
    from asr_dfcnn_transformer_tpu.train import E2ETrainer
    bsz = args.batch_size or 8
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, ev = _data(args, bsz, bounds, e2e_vocab=True)
    train_dl = loader("train", True)
    if args.small:
        model = SpeechTransformer(ev.size, d_model=32, num_heads=4,
                                  num_enc_blocks=1, num_dec_blocks=1,
                                  prenet_channels=8, dropout_rate=0.0,
                                  dtype=jnp.float32)
    else:
        model = SpeechTransformer(ev.size)
    tr = E2ETrainer(model, args.workdir, lr=args.lr or 3e-4,
                    feature_dim=80 if not args.small else 40,
                    augment_spec=getattr(args, "augment_spec", False))
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    if getattr(args, "tensorboard", False):
        tr.enable_tensorboard()
    dev_dl = loader("dev", False)
    first = next(train_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(
        jax.random.PRNGKey(args.seed), first))
    out = tr.fit(lambda: prefetch(train_dl.am_batches(bsz, seed=args.seed)),
                 epochs=args.epochs or 10,
                 rng=jax.random.PRNGKey(args.seed),
                 dev_batches=lambda: dev_dl.am_batches(bsz, shuffle=False))
    print("e2e training done:", out)


def cmd_joint(args):
    """Jointly trained AM->LM (the working am_lm_train.py capability)."""
    from asr_dfcnn_transformer_tpu.data.loader import prefetch
    from asr_dfcnn_transformer_tpu.models import AMLMJoint
    from asr_dfcnn_transformer_tpu.train import JointTrainer
    bsz = args.batch_size or 16
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, lv = _data(args, bsz, bounds)
    train_dl = loader("train", True)
    model = AMLMJoint(av.size, lv.size, small=args.small,
                      dtype=jnp.float32 if args.small else jnp.bfloat16)
    tr = JointTrainer(model, args.workdir, lr=args.lr or 7e-4)
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    if getattr(args, "tensorboard", False):
        tr.enable_tensorboard()
    first = next(train_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(
        jax.random.PRNGKey(args.seed), first))
    dev_dl = loader("dev", False)
    out = tr.fit(lambda: prefetch(train_dl.am_batches(bsz, seed=args.seed)),
                 epochs=args.epochs or 10,
                 rng=jax.random.PRNGKey(args.seed),
                 dev_batches=lambda: dev_dl.am_batches(bsz, shuffle=False))
    print("joint training done:", out)


def cmd_eval_atten(args):
    """Decode the test set with the CTC-attention model (LFR fbank ->
    hanzi CTC) and report hanzi accuracy under the clipped-edit-distance
    protocol — an eval driver the reference never had for this model
    (train_atten.py trains it, nothing evaluates it)."""
    import numpy as np

    from asr_dfcnn_transformer_tpu.models import CTCAttention
    from asr_dfcnn_transformer_tpu.ops import ctc_greedy_decode
    from asr_dfcnn_transformer_tpu.ops.edit_distance import edit_distance
    from asr_dfcnn_transformer_tpu.train.trainer import AttenTrainer
    bsz = args.batch_size or 16
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, lv = _data(args, bsz, bounds)
    test_dl = loader("test", False)
    if args.small:
        model = CTCAttention(lv.size, d_model=32, num_heads=4, num_blocks=1,
                             dropout_rate=0.0, dtype=jnp.float32)
    else:
        model = CTCAttention(lv.size)
    tr = AttenTrainer(model, args.workdir)
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    _require_ckpt(tr, "CTC-attention", args.workdir)
    first = next(test_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), first))

    import functools

    @functools.partial(jax.jit, static_argnames=("bucket_frames",))
    def decode(signals, signal_lengths, bucket_frames):
        feats, valid = tr._features(signals, signal_lengths, bucket_frames)
        logits, in_len = model.apply(
            {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
            feats, valid, train=False)
        return ctc_greedy_decode(logits, in_len, blank_id=-1,
                                 max_output_len=64)

    err = tot = n_utts = 0
    for batch in test_dl.am_batches(bsz, shuffle=False):
        ids, lens = decode(jnp.asarray(batch.signals),
                           jnp.asarray(batch.signal_lengths),
                           batch.bucket_frames)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for j in range(ids.shape[0]):
            if batch.weights[j] == 0:
                continue
            n_utts += 1
            gt = list(batch.hanzi[j][: batch.hanzi_lengths[j]])
            d = edit_distance(gt, list(ids[j][: lens[j]]))
            err += min(d, len(gt))
            tot += len(gt)
    acc = 1.0 - err / max(tot, 1)
    print(f"*[Test Result] atten 汉字 word accuracy ratio: "
          f"{acc * 100:.2f}% ({n_utts} utts)")


def cmd_eval_e2e(args):
    """Decode the test set with the end-to-end speech Transformer
    (AR greedy or length-penalized beam) and report hanzi accuracy under
    the clipped-edit-distance protocol — the evaluation the reference's
    `eval()` stub never implemented (end2end/model.py:130-132)."""
    import numpy as np
    from asr_dfcnn_transformer_tpu import models
    from asr_dfcnn_transformer_tpu.ops.edit_distance import edit_distance
    from asr_dfcnn_transformer_tpu.train import E2ETrainer
    bsz = args.batch_size or 8
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, ev = _data(args, bsz, bounds, e2e_vocab=True)
    test_dl = loader("test", False)
    if args.small:
        model = models.SpeechTransformer(ev.size, d_model=32, num_heads=4,
                                         num_enc_blocks=1, num_dec_blocks=1,
                                         prenet_channels=8, dropout_rate=0.0,
                                         dtype=jnp.float32)
    else:
        model = models.SpeechTransformer(ev.size)
    tr = E2ETrainer(model, args.workdir,
                    feature_dim=80 if not args.small else 40)
    tr.allow_model_mismatch = getattr(
        args, "force_model_mismatch", False)
    _require_ckpt(tr, "end-to-end", args.workdir)
    first = next(test_dl.am_batches(bsz, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), first))
    variables = {"params": tr.state.params}
    if tr.state.batch_stats:
        variables["batch_stats"] = tr.state.batch_stats
    err = tot = n_utts = 0
    for batch in test_dl.am_batches(bsz, shuffle=False):
        feats, valid = tr._features(jnp.asarray(batch.signals),
                                    jnp.asarray(batch.signal_lengths),
                                    batch.bucket_frames)
        # microbatch=8: exact chunked decode — the cross-KV working set
        # outgrows VMEM residency past ~8 utterances, measured 2x at b32
        # (DESIGN.md §9 round 5)
        mb = 8 if feats.shape[0] % 8 == 0 else None
        if args.decode == "beam":
            ids, lens, _ = models.beam_decode_cached(
                model, variables, feats, valid, beam_size=args.beam_width,
                microbatch=mb)
        else:
            ids, lens = models.greedy_decode_cached(model, variables, feats,
                                                    valid, microbatch=mb)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for j in range(ids.shape[0]):
            if batch.weights[j] == 0:
                continue
            n_utts += 1
            gt = list(batch.hanzi[j][: batch.hanzi_lengths[j]])
            pred = list(ids[j][: lens[j]])
            d = edit_distance(gt, pred)
            err += min(d, len(gt))
            tot += len(gt)
    acc = 1.0 - err / max(tot, 1)
    print(f"*[Test Result] e2e 汉字 word accuracy ratio: {acc * 100:.2f}% "
          f"({n_utts} utts, decode={args.decode})")


def cmd_eval_lm(args):
    """LM-only eval on ground-truth pinyin (test_lm.py capability)."""
    pipe, test_dl, bsz = _load_pipeline(args, need_am=False)
    res = pipe.evaluate_lm(
        test_dl.lm_batches(bsz, shuffle=False),
        pred_log_path=os.path.join(args.workdir, "pred", "pred_lm_log"))
    print(f"*[Test Result] 汉字 word accuracy ratio: "
          f"{res.hanzi_accuracy * 100:.2f}%")


def _require_ckpt(trainer, what: str, workdir: str) -> None:
    """Eval/infer must not silently run on random init weights (a mistyped
    --workdir would otherwise produce plausible near-zero accuracy)."""
    if trainer.ckpt.latest_step() is None:
        hint = " or pass --am-hdf5" if what == "AM" else ""
        raise SystemExit(
            f"error: no {what} checkpoint found under {workdir!r} — "
            f"eval/infer refuses to run on randomly initialized weights. "
            f"Train first{hint}.")


def _load_pipeline(args, decode="greedy", beam_width=8, need_am=True):
    from asr_dfcnn_transformer_tpu.infer import Pipeline
    from asr_dfcnn_transformer_tpu.train import AMTrainer, LMTrainer
    bsz = args.batch_size or 16
    bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    loader, av, lv = _data(args, bsz, bounds)
    test_dl = loader("test", False)
    lm = _lm_model(av.size, lv.size, args.small)
    if getattr(args, "lm_tf_ckpt", None):
        from asr_dfcnn_transformer_tpu.infer.tf_ckpt import load_tf1_lm
        lm_vars = jax.tree.map(jnp.asarray, load_tf1_lm(
            args.lm_tf_ckpt, av.size, lv.size, num_blocks=lm.num_blocks))
    else:
        lmt = LMTrainer(lm, args.workdir)
        lmt.allow_model_mismatch = getattr(
            args, "force_model_mismatch", False)
        _require_ckpt(lmt, "LM", args.workdir)
        lm_first = next(test_dl.lm_batches(bsz, shuffle=False))
        lm_state = lmt.restore_or_init(lambda: lmt.init_state(
            jax.random.PRNGKey(1), lm_first))
        lm_vars = {"params": lm_state.params}

    if getattr(args, "am_hdf5", None):
        from asr_dfcnn_transformer_tpu import models
        if getattr(args, "model", "se_dfcnn") == "bigru":
            import numpy as np
            from asr_dfcnn_transformer_tpu.infer.hdf5_import import (
                load_keras_bigru_hdf5)
            raw_v = load_keras_bigru_hdf5(args.am_hdf5, av.size)
            hidden = np.asarray(
                raw_v["params"]["gru_fwd_0"]["kernel"]).shape[1] // 3
            am = models.BiGRUCTC(vocab_size=av.size, hidden=hidden,
                                 keras_parity=True)
            am_vars = jax.tree.map(jnp.asarray, raw_v)
        else:
            from asr_dfcnn_transformer_tpu.infer.hdf5_import import (
                load_keras_dfcnn_hdf5)
            am = models.KerasDFCNN(vocab_size=av.size)
            am_vars = jax.tree.map(
                jnp.asarray, load_keras_dfcnn_hdf5(args.am_hdf5, av.size))
    elif getattr(args, "am_tf_ckpt", None):
        from asr_dfcnn_transformer_tpu import models
        from asr_dfcnn_transformer_tpu.infer.tf_ckpt import load_tf1_sedfcnn
        am = models.SEDFCNN(vocab_size=av.size)
        am_vars = jax.tree.map(jnp.asarray,
                               load_tf1_sedfcnn(args.am_tf_ckpt, av.size))
    else:
        am = _am_model(getattr(args, "model", "se_dfcnn"), av.size,
                       args.small,
                       logits_matmul=getattr(args, "logits_matmul", "f32"))
        amt = AMTrainer(am, args.workdir)
        amt.allow_model_mismatch = getattr(
            args, "force_model_mismatch", False)
        if need_am or amt.ckpt.latest_step() is not None:
            _require_ckpt(amt, "AM", args.workdir)
            first = next(test_dl.am_batches(bsz, shuffle=False))
            am_state = amt.restore_or_init(lambda: amt.init_state(
                jax.random.PRNGKey(0), first))
            am_vars = {"params": am_state.params,
                       "batch_stats": am_state.batch_stats}
        else:
            # LM-only eval: the AM is never applied — random init stands in
            import numpy as np
            am_vars = am.init(jax.random.PRNGKey(0),
                              np.zeros((1, 32, 200, 1), np.float32),
                              train=False)
    pipe = Pipeline(
        am, am_vars, lm, lm_vars,
        acoustic_vocab=av, language_vocab=lv, decode=decode,
        beam_width=beam_width)
    return pipe, test_dl, bsz


def cmd_eval(args):
    pipe, test_dl, bsz = _load_pipeline(args, args.decode, args.beam_width)
    batches = test_dl.am_batches(bsz, shuffle=False)
    if args.limit:
        import itertools
        batches = itertools.islice(batches, max(1, args.limit // bsz))
    res = pipe.evaluate(batches, pred_log_path=os.path.join(
        args.workdir, "pred", "pred_log"))
    print(f"*[Test Result] 拼音 word accuracy ratio: "
          f"{res.pinyin_accuracy * 100:.2f}%")
    print(f"*[Test Result] 汉字 word accuracy ratio: "
          f"{res.hanzi_accuracy * 100:.2f}%")
    print("pred_log:", res.pred_log_path)


def cmd_infer(args):
    pipe, _, _ = _load_pipeline(args, args.decode)
    if getattr(args, "streaming", False):
        from asr_dfcnn_transformer_tpu.audio.wav import read_wav
        from asr_dfcnn_transformer_tpu.infer.streaming import (
            IncrementalRecognizer)
        sig, sr = read_wav(args.wav)
        rec = IncrementalRecognizer(pipe)
        step = max(1, int(args.chunk_seconds * sr))
        for i in range(0, len(sig), step):
            rec.push(sig[i: i + step])
            pinyin, hanzi = rec.partial()
            print(f"[{min(i + step, len(sig)) / sr:6.2f}s] "
                  f"{' '.join(pinyin)} | {hanzi}", flush=True)
        pinyin, hanzi = rec.finalize()
    else:
        pinyin, hanzi = pipe.recognize_file(args.wav)
    print("拼音:", " ".join(pinyin))
    print("汉字:", hanzi)


def cmd_export(args):
    """Hand a trained model back to the reference stack: TF1 tensor_bundle
    (AM Saver train.py:38 / LM Saver train.py:148) or Keras .hdf5
    (cnn_ctc.py:85 / cnn_rnn_ctc layout)."""
    import numpy as np

    from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline
    ckpt_name = "lm" if args.what == "lm" else "am"
    raw = Pipeline._restore_raw(args.workdir, ckpt_name,
                                use_best=not args.use_latest)
    if raw is None:
        raise SystemExit(
            f"error: no {ckpt_name.upper()} checkpoint under "
            f"{args.workdir!r}")
    variables = {"params": raw["params"]}
    if raw.get("batch_stats"):
        variables["batch_stats"] = raw["batch_stats"]
    try:
        if args.what == "lm":
            if args.format != "tf1":
                raise SystemExit(
                    "error: the LM has no Keras layout; use --format tf1")
            from asr_dfcnn_transformer_tpu.infer.tf_ckpt import (
                export_tf1_lm, write_tf_checkpoint)
            nb = sum(k.startswith("block0_") and k.endswith("_attn")
                     for k in variables["params"])
            write_tf_checkpoint(args.out,
                                export_tf1_lm(variables, num_blocks=nb))
        elif args.what == "bigru":
            if args.format != "hdf5":
                raise SystemExit(
                    "error: the BiGRU maps to the Keras cnn_rnn_ctc "
                    "layout; use --format hdf5")
            from asr_dfcnn_transformer_tpu.infer.hdf5_import import (
                save_keras_bigru_hdf5)
            p = variables["params"]
            save_keras_bigru_hdf5(
                args.out, variables,
                vocab_size=np.asarray(p["Dense_3"]["kernel"]).shape[1],
                hidden=np.asarray(p["gru_fwd_0"]["kernel"]).shape[1] // 3)
        elif args.format == "tf1":
            from asr_dfcnn_transformer_tpu.infer.tf_ckpt import (
                export_tf1_sedfcnn, write_tf_checkpoint)
            write_tf_checkpoint(args.out, export_tf1_sedfcnn(variables))
        else:
            from asr_dfcnn_transformer_tpu.infer.hdf5_import import (
                save_keras_dfcnn_hdf5)
            p = variables["params"]
            save_keras_dfcnn_hdf5(
                args.out, variables,
                vocab_size=np.asarray(p["Dense_1"]["kernel"]).shape[1],
                dense_units=np.asarray(p["Dense_0"]["kernel"]).shape[1])
    except KeyError as e:
        raise SystemExit(
            f"error: checkpoint layout does not match the {args.what}/"
            f"{args.format} export mapping (tf1 = se_dfcnn family or lm, "
            f"hdf5 = keras_dfcnn or keras_parity bigru); missing {e}")
    print(f"exported {args.what} {args.format} -> {args.out}")


def cmd_export_serving(args):
    """One self-contained serving artifact: the live inference program
    (jax.export) + weights + vocab tables. Data-free: raw checkpoint
    restore (metric-gated best by default, like `export`) + asset vocabs
    — no corpus, loaders or trainer state needed to export."""
    from asr_dfcnn_transformer_tpu.core import vocab as V
    from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline
    batch_sizes = tuple(int(x) for x in
                        args.serve_batch_sizes.split(",") if x)
    buckets = tuple(int(x) for x in args.serve_buckets.split(",") if x)
    platforms = (tuple(args.serve_platforms.split(","))
                 if args.serve_platforms else None)
    use_best = not args.use_latest
    if args.what == "e2e":
        from asr_dfcnn_transformer_tpu import models
        from asr_dfcnn_transformer_tpu.infer.export_serving import (
            export_e2e)
        ev = V.e2e_language_vocab()
        if args.small:
            model = models.SpeechTransformer(
                ev.size, d_model=32, num_heads=4, num_enc_blocks=1,
                num_dec_blocks=1, prenet_channels=8, dropout_rate=0.0,
                dtype=jnp.float32)
        else:
            model = models.SpeechTransformer(ev.size)
        raw = Pipeline._restore_raw(
            args.workdir, "e2e", use_best, model=model,
            allow_mismatch=getattr(args, "force_model_mismatch", False))
        if raw is None:
            raise SystemExit(f"error: no end-to-end checkpoint under "
                             f"{args.workdir!r}")
        variables = {"params": raw["params"]}
        if raw.get("batch_stats"):
            variables["batch_stats"] = raw["batch_stats"]
        variables = jax.tree.map(jnp.asarray, variables)
        meta = export_e2e(model, variables, args.out, vocab=ev,
                          feature_dim=80 if not args.small else 40,
                          decode=args.decode,
                          beam_width=(args.beam_width
                                      if args.decode == "beam" else 3),
                          batch_sizes=batch_sizes, buckets=buckets,
                          platforms=platforms)
    else:
        from asr_dfcnn_transformer_tpu.infer.export_serving import (
            export_pipeline)
        av, lv = V.acoustic_vocab(), V.language_vocab()
        am = _am_model(args.model, av.size, args.small)
        lm = None if args.no_lm else _lm_model(av.size, lv.size,
                                               args.small)
        pipe = Pipeline.from_checkpoints(
            args.workdir, am, lm, acoustic_vocab=av,
            language_vocab=None if args.no_lm else lv, use_best=use_best,
            decode=args.decode, beam_width=args.beam_width,
            allow_model_mismatch=getattr(args, "force_model_mismatch",
                                         False))
        meta = export_pipeline(pipe, args.out, batch_sizes=batch_sizes,
                               buckets=buckets, platforms=platforms)
    print(f"exported serving artifact -> {args.out} "
          f"(kind={meta['kind']}, {len(meta['programs'])} entry points, "
          f"decode={meta['decode']})")


def cmd_infer_artifact(args):
    """Artifact-only recognition: load_artifact + recognize, nothing
    else (the deployment-side counterpart of `infer`)."""
    from asr_dfcnn_transformer_tpu.audio.wav import read_wav
    from asr_dfcnn_transformer_tpu.infer.export_serving import (
        E2EServing, load_artifact)
    served = load_artifact(args.artifact)
    sig, _ = read_wav(args.wav)
    if isinstance(served, E2EServing):
        print("汉字:", served.recognize_signal(sig))
    else:
        pinyin, hanzi = served.recognize_signal(sig)
        print("拼音:", " ".join(pinyin))
        if served.language_vocab is not None:  # --no-lm artifacts have
            print("汉字:", hanzi)              # no hanzi stage at all


def cmd_serve(args):
    """HTTP recognition endpoint over a live pipeline (micro-batched) or
    an AOT serving artifact — the network-serving surface the reference's
    read_wav.py loop never had."""
    import time

    from asr_dfcnn_transformer_tpu.infer.http_server import (
        HTTPRecognitionServer)
    if args.artifact:
        from asr_dfcnn_transformer_tpu.infer.export_serving import (
            load_artifact)
        backend = load_artifact(args.artifact)
        bounds = (400, 800, 1200, 1600)
    else:
        if not args.workdir:
            raise SystemExit(
                "serve: pass --workdir (live checkpoints) or --artifact")
        backend, _, _ = _load_pipeline(args, args.decode, args.beam_width)
        bounds = (128,) if args.synthetic else (400, 800, 1200, 1600)
    if args.streams and args.artifact:
        raise SystemExit("serve: --streams needs a live --workdir backend")
    srv = HTTPRecognitionServer(
        backend, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        bucket_bounds=bounds, streams=args.streams,
        stream_kw={"idle_timeout_s": args.stream_idle_timeout}
        if args.streams else None)
    print(f"serving on http://{args.host}:{srv.port} "
          f"(backend: {srv._backend.kind}"
          + (f", {args.streams} stream slots" if args.streams else "")
          + ")", flush=True)
    if args.max_requests:
        srv.start()
        while srv.requests_served < args.max_requests:
            time.sleep(0.05)
        srv.close()
        return
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()


def main(argv=None):
    args = _build_parser().parse_args(argv)
    _setup_platform(args)
    # read-only commands must not run _apply_config: it snapshots the
    # resolved config over <workdir>/config.json, clobbering the record
    # written at training time (and artifact-mode serve has no workdir)
    if args.cmd not in ("export", "export-serving", "infer-artifact") \
            and getattr(args, "workdir", None):
        _apply_config(args)
    {"am": cmd_am, "lm": cmd_lm, "atten": cmd_atten, "e2e": cmd_e2e,
     "joint": cmd_joint, "eval": cmd_eval, "eval-lm": cmd_eval_lm,
     "eval-e2e": cmd_eval_e2e, "eval-atten": cmd_eval_atten,
     "infer": cmd_infer, "export": cmd_export,
     "export-serving": cmd_export_serving,
     "infer-artifact": cmd_infer_artifact, "serve": cmd_serve}[args.cmd](args)


if __name__ == "__main__":
    main()
