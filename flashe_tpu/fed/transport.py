"""Abstract federation transport with authorization and GC.

Message semantics follow the reference transfer layer
(arch/api/transfer/__init__.py:278-302, base_transfer_variable.py:96-140):
named, tag-addressed, authorized point-to-point object transfer.  A message
key is (variable_name, tag, src_party, dst_party); tags are built from the
job flow id plus per-call suffixes, so every logical transfer is unique and
consumed exactly once (the reference's Cleaner keep-latest-2 GC becomes
consume-on-get plus protocol-level resend).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

from flashe_tpu.fed import consts

__all__ = ["Party", "Federation", "FederationAuthorization"]


@dataclasses.dataclass(frozen=True, order=True)
class Party:
    """(role, party_id) — reference arch/api/transfer/__init__.py Party."""

    role: str
    party_id: int

    def __str__(self):
        return f"{self.role}:{self.party_id}"


class FederationAuthorization:
    """src/dst role matrix per variable name (reference
    transfer_variable/definition/transfer_conf.json + jzf_homo.json)."""

    def __init__(self, table: Dict[str, Dict[str, Sequence[str]]]):
        self._table = table

    def check(self, name: str, src_role: str, dst_role: str):
        if name not in self._table:
            raise PermissionError(f"variable {name} not authorized")
        ent = self._table[name]
        if src_role not in ent["src"] or dst_role not in ent["dst"]:
            raise PermissionError(
                f"{name}: {src_role}->{dst_role} not in authorization matrix "
                f"(allowed {ent['src']}->{ent['dst']})"
            )


class Federation:
    """Per-party handle; subclasses implement _send/_recv."""

    def __init__(self, job_id: str, local: Party, parties: Sequence[Party],
                 authorization: FederationAuthorization | None = None):
        self.job_id = job_id
        self.local = local
        self.parties = list(parties)
        self.auth = authorization

    def roles_to_parties(self, roles: Sequence[str]) -> List[Party]:
        return [p for role in roles for p in self.parties if p.role == role]

    def remote(self, obj: Any, name: str, tag: str, dst: Party):
        if self.auth is not None:
            self.auth.check(name, self.local.role, dst.role)
        self._send(obj, name, f"{self.job_id}.{tag}", self.local, dst)

    def get(self, name: str, tag: str, src: Party, timeout: float = 600.0):
        if self.auth is not None:
            self.auth.check(name, src.role, self.local.role)
        return self._recv(name, f"{self.job_id}.{tag}", src, self.local,
                          timeout)

    def clean(self, name: str, src: Party):
        """Drop any undelivered messages for (name, src->local)."""
        self._clean(name, src, self.local)

    # -- transport hooks ---------------------------------------------------

    def _send(self, obj, name, tag, src: Party, dst: Party):
        raise NotImplementedError

    def _recv(self, name, tag, src: Party, dst: Party, timeout: float):
        raise NotImplementedError

    def _clean(self, name, src: Party, dst: Party):
        raise NotImplementedError


def default_parties(n_hosts: int) -> List[Party]:
    """guest(0) + hosts(1..n) + arbiter — canonical party layout."""
    return (
        [Party(consts.GUEST, 0)]
        + [Party(consts.HOST, i) for i in range(n_hosts)]
        + [Party(consts.ARBITER, 0)]
    )
