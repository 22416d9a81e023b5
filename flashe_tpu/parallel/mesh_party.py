"""SPMD federated training: one JAX process per client over a global mesh.

The intra-datacenter deployment mode (BASELINE config #5; SURVEY §2.5):
when the silos are hosts of one TPU pod (or one operator's machines),
the whole federation runs as a single multi-controller JAX program —
client i is process i, its devices are its lane shards, and each round's
encrypted aggregation is `encrypt -> psum -> decrypt` on the global
(clients, lanes) mesh (parallel/sharded.py workers).  No broker, no
serialization: ciphertext movement is XLA collectives over ICI/DCN.

This complements (does not replace) the TCP federation: cross-silo WAN
deployments keep the broker/protocol path (fed/tcp.py, runtime/cluster.py)
where parties are mutually distrusting; the mesh party is for a party —
or a trusted consortium — that owns a slice and wants the reference's
aggregation semantics at pod speed.  Key distribution degenerates
accordingly: all processes belong to the operator, so the PRP seed is
preshared configuration rather than DH-wrapped (the federated guest/host
seed exchange lives in protocol/blocks/flashe.py).

Quantization uses the same secure-ACIQ discipline as the protocol path:
alpha comes from running statistics of the *previous global model*
(quant/quantizer.py), which every process computes identically, so lane
scales agree without any coordination message.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

from flashe_tpu.parallel import multihost
from flashe_tpu.parallel.sharded import padded_lane_count

__all__ = ["run_mesh_training"]


def run_mesh_training(coordinator: str, num_processes: int, process_id: int,
                      *, model: str = "mlp", model_kwargs: Optional[dict] = None,
                      rounds: int = 5, epochs_per_round: int = 1,
                      batch_size: int = 32, learning_rate: float = 0.05,
                      optimizer: str = "sgd", int_bits: int = 20,
                      element_bits: int = 16, data: Optional[str] = None,
                      samples: int = 256, prp_seed: bytes = bytes(range(32)),
                      seed: int = 0, verbose: bool = False) -> dict:
    """Train a model federatedly across the slice; returns this process's
    view: {"loss_history": [...], "model_digest": hex, "rounds": N}.

    data: optional .npz with arrays x, y (this process's private shard);
    default synthetic classification blobs partitioned by process id.
    Every process returns the same model_digest — asserted by
    tests/test_mesh_party.py as the convergence-of-state check.
    """
    multihost.init_multihost(coordinator, num_processes, process_id)

    from flashe_tpu import jaxenv

    jaxenv.setup()

    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from flashe_tpu.nn.models import build_model, init_params
    from flashe_tpu.nn.trainer import LocalTrainer
    from flashe_tpu.nn.weights import WeightsCodec
    from flashe_tpu.ops import aes
    from flashe_tpu.quant.quantizer import QuantizingClient

    mesh = multihost.make_multihost_mesh()
    n_clients = mesh.shape["clients"]
    n_shards = mesh.shape["lanes"]
    assert n_clients == num_processes

    # -- local data (private to this process) -----------------------------
    if data:
        blob = np.load(data)
        x, y = blob["x"], blob["y"]
        num_classes = int(y.max()) + 1
    else:
        rng = np.random.RandomState(1000 + process_id)
        num_classes = 4
        centers = np.random.RandomState(7).randn(num_classes, 8) * 2.0
        y = rng.randint(0, num_classes, samples).astype(np.int32)
        x = (centers[y] + rng.randn(samples, 8) * 0.7).astype(np.float32)

    # -- shared-init model + quantizer ------------------------------------
    mdl = build_model(model, **(model_kwargs or {}))
    params = init_params(mdl, jnp.asarray(x[:1]), seed=0)  # same on all
    codec = WeightsCodec(params)
    trainer = LocalTrainer(mdl, params, optimizer=optimizer,
                           learning_rate=learning_rate,
                           seed=seed + process_id)
    quant = QuantizingClient(int_bits, False, element_bits, True, True,
                             seed=seed + process_id)
    quant.set_codec(codec)
    quant.set_num_clients(n_clients)

    n_lanes = padded_lane_count(codec.total, int_bits, n_shards)
    rk = jnp.asarray(aes.key_schedule(prp_seed).astype(np.int32))

    degree = float(len(x))
    degrees = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([degree], jnp.float32))).reshape(-1)
    total_degree = float(degrees.sum())

    losses = []
    for r in range(rounds):
        train_loss = trainer.train(x, y, epochs=epochs_per_round,
                                   batch_size=min(batch_size, len(x)))
        flat = codec.flatten(trainer.params) * degree

        # encode: normalize by running layer means, ACIQ clip, stochastic
        # round — scales identical on every process by construction
        quant.set_iter(r)
        q = np.asarray(quant.quantize(quant.normalize(flat)))
        q_pad = np.zeros(n_lanes, np.uint32)
        q_pad[: codec.total] = q

        out = multihost.multihost_encrypted_aggregate(
            mesh, rk, q_pad[None, :], jnp.int32(r), int_bits, n_clients)
        full = np.asarray(multihost_utils.process_allgather(
            out, tiled=True)).reshape(-1)[: codec.total]

        # decode, mirroring protocol/aggregator.get_aggregated_model:
        # unquantize the n-client sum (alpha x num_clients rule), apply
        # the degree weighting, restore layer means + refresh running
        # stats, then drop this client's own degree factor
        agg = quant.unquantize(jnp.asarray(full))
        agg = agg * (degree / total_degree)
        agg = quant.unnormalize(agg)
        agg = agg / degree
        trainer.set_model_weights(codec.unflatten(jnp.asarray(agg)))

        loss, acc = trainer.evaluate(x, y)
        loc = jnp.asarray([loss * degree], jnp.float32)
        mean_loss = float(np.asarray(
            multihost_utils.process_allgather(loc)).sum() / total_degree)
        losses.append(mean_loss)
        if verbose:
            print(f"[mesh-party {process_id}] round {r}: "
                  f"local_train={train_loss:.4f} fed_eval={mean_loss:.4f}",
                  flush=True)

    digest = hashlib.sha256(
        np.asarray(codec.flatten(trainer.params)).tobytes()).hexdigest()
    return {"loss_history": losses, "model_digest": digest,
            "rounds": rounds, "process_id": process_id,
            "mesh": dict(mesh.shape)}
