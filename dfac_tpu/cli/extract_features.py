"""``dfac-extract-features`` — raw audio -> features.pkl.

The upstream-of-the-reference step (the corpus ships precomputed,
``README.md:23``): runs the TPU LFCC front-end over a directory/array of
waveforms and writes a ``features.pkl`` compatible with every downstream
consumer (ours and the reference's).

Inputs: ``.npy``/``.npz`` waveform files (mono float, 16 kHz) or one ``.npz``
archive mapping uttid -> waveform. (.wav via scipy.io.wavfile when present.)
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_waveform(path: str, sample_rate: int) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32).reshape(-1)
    if path.endswith(".wav"):
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if sr != sample_rate:
            raise ValueError(f"{path}: sample rate {sr} != {sample_rate}")
        if data.dtype.kind == "i":
            data = data / float(np.iinfo(data.dtype).max)
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data.astype(np.float32)
    raise ValueError(f"unsupported audio file: {path}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Extract LFCC+delta+delta-delta features on TPU.")
    p.add_argument("--audio", required=True,
                   help="directory of .npy/.wav files, or a single .npz archive {uttid: waveform}")
    p.add_argument("--out", required=True,
                   help="output features.pkl path, or a directory when --format npy")
    p.add_argument("--format", default="pkl", choices=["pkl", "npy"],
                   help="pkl = reference-contract features.pkl; npy = "
                   "memory-mapped corpus store directory (io/npy_store.py), "
                   "skipping the pickle bottleneck at scale")
    p.add_argument("--frames", type=int, default=321,
                   help="frames per utterance; waveforms are cropped/zero-padded to match")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--method", default="gemm", choices=["gemm", "fft-pallas", "fft"],
                   help="front-end implementation (gemm = fused GEMM-native kernel, fastest on TPU)")
    p.add_argument("--no-pallas", action="store_true", help="alias for --method fft")
    p.add_argument("--tensor-format", default="auto", choices=["auto", "torch", "numpy"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from dfac_tpu.features.lfcc import LFCCConfig, lfcc_features_batch
    from dfac_tpu.io.pickle_io import write_features

    cfg = LFCCConfig(sample_rate=args.sample_rate)
    n_samples = cfg.num_samples(args.frames)

    uttids: list[str] = []
    waves: list[np.ndarray] = []
    if args.audio.endswith(".npz"):
        with np.load(args.audio) as archive:
            for uttid in sorted(archive.files):
                uttids.append(uttid)
                waves.append(archive[uttid].astype(np.float32).reshape(-1))
    else:
        for name in sorted(os.listdir(args.audio)):
            path = os.path.join(args.audio, name)
            if not name.endswith((".npy", ".wav")):
                continue
            uttids.append(os.path.splitext(name)[0])
            waves.append(_load_waveform(path, args.sample_rate))
    if not uttids:
        raise SystemExit(f"no waveforms found in {args.audio}")

    fixed = np.zeros((len(waves), n_samples), np.float32)
    for i, w in enumerate(waves):
        n = min(len(w), n_samples)
        fixed[i, :n] = w[:n]

    feats = lfcc_features_batch(
        fixed, cfg, batch_size=args.batch_size,
        method="fft" if args.no_pallas else args.method,
    )
    if args.format == "npy":
        from dfac_tpu.data.pipeline import ArrayDataset
        from dfac_tpu.io.npy_store import save_npy_dataset

        save_npy_dataset(ArrayDataset(uttids=uttids, features=feats), args.out)
    else:
        write_features(args.out, uttids, feats, tensor_format=args.tensor_format)
    print(f"wrote {len(uttids)} x {feats.shape[1]}x{feats.shape[2]} features to {args.out}")


if __name__ == "__main__":
    main()
