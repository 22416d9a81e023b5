"""Federation: tag-addressed object transfer between parties.

Re-imagines the reference's gRPC/eggroll/Java-proxy stack
(arch/api/transfer, arch/driver/federation, arch/networking/proxy) as a
thin library: control-plane and key-exchange objects move over a pluggable
transport (in-memory broker for simulation/tests, TCP for multi-host),
while bulk ciphertext movement on a TPU slice uses device collectives
(flashe_tpu/parallel) instead of a byte pipe.
"""

from flashe_tpu.fed.consts import ARBITER, GUEST, HOST
from flashe_tpu.fed.transport import Federation, Party
from flashe_tpu.fed.inmem import InMemBroker, InMemFederation
from flashe_tpu.fed.tcp import FedBroker, TcpFederation

__all__ = [
    "ARBITER", "GUEST", "HOST",
    "Federation", "Party", "InMemBroker", "InMemFederation",
    "FedBroker", "TcpFederation",
]
