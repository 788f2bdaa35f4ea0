"""Minimal inference server over a trained checkpoint.

Production-serving counterpart of the reference's Jetson deploy image
(reference: build/Dockerfile:16-26, which ran `train_ards_detector.py
--no-train` against a checkpoint).  Loads the model once, pre-warms the
jitted forward at a fixed batch shape, and serves:

  GET  /health            -> {"status": "ok", model info}
  POST /predict           -> per-window probabilities + patient votes

Request body: JSON ``{"data": [[..window (S,C,L)..], ...],
"patients": ["a", ...]}`` (patients optional; votes grouped by it) or a
raw .npz upload (array under key "data", optional "patients").

Stdlib-only (http.server): no serving-framework dependency to pin, and
the jitted fixed-shape forward means steady-state latency is one device
dispatch.  Padding to the warm batch size keeps a single compiled
program hot for any request size; the serving model uses per-sequence
normalization statistics (bn_scope='sequence') so the zero pad rows
cannot contaminate real windows.  Input scaling factors are REQUIRED
(from a --scaling-pickle or the checkpoint's .scaling.json sidecar)
unless --allow-unscaled explicitly opts out.
"""
import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class InferenceEngine:
    """Jitted fixed-shape forward over a checkpoint."""

    def __init__(self, checkpoint, network="cnn_linear",
                 base_network="densenet18", n_sub_batches=20,
                 batch_size=16, scaling=None, bn_scope="sequence"):
        import jax
        import jax.numpy as jnp

        from deepards_tpu.config.config import Configuration
        from deepards_tpu.models.registry import (
            get_base_network,
            get_network_spec,
        )
        from deepards_tpu.train import checkpoint as ckpt

        # bn_scope='sequence' by default: serving pads partial chunks to
        # the warm batch size, and under bn_scope='batch' the all-zero
        # pad rows would contaminate the batch-stat normalization of
        # real windows (the same request would score differently by
        # request size).  Per-sequence statistics are pad-immune; the
        # vmap lift shares params, so a 'batch'-trained checkpoint
        # restores unchanged.
        conf = Configuration(overrides={
            "base_network": base_network, "network": network,
            "bn_scope": bn_scope,
        })
        spec = get_network_spec(network)
        self.model = spec.build(
            conf, get_base_network(conf), n_sub_batches, 0)
        self.params = ckpt.restore(checkpoint)["params"]
        self.batch_size = batch_size
        self.n_sub_batches = n_sub_batches
        self.network = network
        self.bn_scope = bn_scope
        self.scaling = scaling  # (mu, std) or None

        model = self.model
        params = self.params
        if scaling:
            mu = jnp.asarray(np.asarray(scaling[0], np.float32).ravel())
            std = jnp.asarray(np.asarray(scaling[1], np.float32).ravel())
            # broadcast over (N, S, C, L): scalar or per-channel factors
            if mu.size > 1:
                mu = mu.reshape(1, 1, -1, 1)
                std = std.reshape(1, 1, -1, 1)
        else:
            mu, std = 0.0, 1.0

        @jax.jit
        def forward(data):
            x = (data - mu) / std
            out = model.apply(
                {"params": params}, x, None, False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            if isinstance(out, tuple):
                out = out[0]
            return jax.nn.softmax(out, axis=-1)

        self._forward = forward
        self._jnp = jnp
        self._lock = threading.Lock()

    def warm(self, channels=1, length=224):
        x = np.zeros(
            (self.batch_size, self.n_sub_batches, channels, length),
            np.float32,
        )
        self._forward(self._jnp.asarray(x)).block_until_ready()

    def predict(self, data):
        """data: (N, S, C, L) -> (N, 2) probabilities (padded dispatch
        at the warm batch size so the compiled program stays hot)."""
        data = np.asarray(data, np.float32)
        if data.ndim == 3:
            data = data[None]
        n = data.shape[0]
        probs = []
        with self._lock:  # one device queue; keep dispatches ordered
            for lo in range(0, n, self.batch_size):
                chunk = data[lo:lo + self.batch_size]
                pad = self.batch_size - len(chunk)
                if pad:
                    chunk = np.concatenate([
                        chunk,
                        np.zeros((pad,) + chunk.shape[1:], chunk.dtype),
                    ])
                out = np.asarray(self._forward(self._jnp.asarray(chunk)))
                if out.ndim == 3:  # per-breath heads -> mean over windows
                    out = out.mean(axis=1)
                probs.append(out[: len(data[lo:lo + self.batch_size])])
        return np.concatenate(probs)[:n]


def patient_votes(probs, patients):
    """Per-patient ARDS vote fraction + majority prediction
    (reference vote protocol: metrics.py:572-626)."""
    votes = {}
    for p, pr in zip(patients, probs):
        votes.setdefault(str(p), []).append(int(pr.argmax()))
    return {
        p: {
            "pred_frac": float(np.mean(v)),
            "prediction": int(np.mean(v) >= 0.5),
            "n_windows": len(v),
        }
        for p, v in votes.items()
    }


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass  # quiet; the caller owns logging

        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {
                    "status": "ok",
                    "network": engine.network,
                    "n_sub_batches": engine.n_sub_batches,
                    "batch_size": engine.batch_size,
                    "bn_scope": engine.bn_scope,
                    "scaled": engine.scaling is not None,
                })
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                ctype = self.headers.get("Content-Type", "")
                if "json" in ctype:
                    req = json.loads(raw)
                    data = np.asarray(req["data"], np.float32)
                    patients = req.get("patients")
                else:
                    z = np.load(io.BytesIO(raw), allow_pickle=False)
                    data = np.asarray(z["data"], np.float32)
                    patients = (
                        [str(p) for p in z["patients"]]
                        if "patients" in z else None
                    )
                probs = engine.predict(data)
                resp = {
                    "prob_other": probs[:, 0].tolist(),
                    "prob_ards": probs[:, 1].tolist(),
                    "predictions": probs.argmax(axis=1).tolist(),
                }
                if patients is not None:
                    resp["patient_votes"] = patient_votes(probs, patients)
                self._send(200, resp)
            except Exception as exc:  # surface the error to the client
                self._send(400, {
                    "error": "{}: {}".format(type(exc).__name__, exc),
                })

    return Handler


def serve(engine, host="127.0.0.1", port=8476):
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("--network", default="cnn_linear")
    parser.add_argument("--base-network", default="densenet18")
    parser.add_argument("--n-sub-batches", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8476)
    parser.add_argument("--scaling-pickle",
                        help="dataset cache whose train scaling factors "
                        "normalize incoming windows")
    parser.add_argument("--bn-scope", default="sequence",
                        choices=("sequence", "batch"),
                        help="normalization scope for serving; 'sequence' "
                        "(default) is pad-immune, 'batch' reproduces "
                        "training-time whole-batch statistics but lets "
                        "pad rows contaminate partial chunks")
    parser.add_argument("--allow-unscaled", action="store_true",
                        help="serve without input scaling factors "
                        "(predictions from a pipeline-trained checkpoint "
                        "will be WRONG; for debugging only)")
    args = parser.parse_args(argv)

    scaling = None
    if args.scaling_pickle:
        from deepards_tpu.data.dataset import ARDSRawDataset

        ds = ARDSRawDataset.from_pickle(args.scaling_pickle)
        factors = getattr(ds, "scaling_factors", None)
        if factors:
            first = next(iter(factors.values()))
            scaling = (np.asarray(first[0]), np.asarray(first[1]))
    if scaling is None:
        # checkpoints trained with --save-model embed their fold scaling
        from deepards_tpu.train import checkpoint as ckpt

        scaling = ckpt.load_scaling(args.checkpoint)
    if scaling is None:
        msg = ("no scaling factors: pass --scaling-pickle or use a "
               "checkpoint with a .scaling.json sidecar; a checkpoint "
               "trained through the normalization pipeline will serve "
               "mis-scaled (wrong) predictions without them")
        if not args.allow_unscaled:
            parser.error(msg)
        print("WARNING: {} (continuing: --allow-unscaled)".format(msg))

    engine = InferenceEngine(
        args.checkpoint, network=args.network,
        base_network=args.base_network,
        n_sub_batches=args.n_sub_batches, batch_size=args.batch_size,
        scaling=scaling, bn_scope=args.bn_scope,
    )
    engine.warm()
    server = serve(engine, args.host, args.port)
    print("serving {} on http://{}:{}".format(
        args.network, args.host, args.port))
    server.serve_forever()


if __name__ == "__main__":
    main()
