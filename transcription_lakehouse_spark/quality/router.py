"""Validator routing (config-as-data): which checks run on which tables.

Reference: `/root/reference/src/lakehouse/quality/validator_router.py:18-76`
+ `config/validator_routing.yaml`. The config is plain data (dict or YAML
when pyyaml is present — gated import, not in every container)."""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["ValidatorRouter", "DEFAULT_ROUTING"]

# check name -> tables it applies to (reference's YAML defaults)
DEFAULT_ROUTING: dict[str, tuple[str, ...]] = {
    "coverage": ("spans",),
    "distribution": ("spans", "beats", "sections"),
    "integrity": ("spans", "beats"),
    "balance": ("spans",),
    "text_quality": ("spans", "beats"),
    "embedding_sanity": ("spans", "beats"),
    "diagnostics": ("spans",),
}


@dataclass
class ValidatorRouter:
    routing: dict[str, tuple[str, ...]] = field(
        default_factory=lambda: dict(DEFAULT_ROUTING)
    )

    @classmethod
    def from_yaml(cls, path: str) -> "ValidatorRouter":
        try:
            import yaml  # gated: pyyaml is optional in this container
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "pyyaml not installed; construct ValidatorRouter from a dict"
            ) from e
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls({k: tuple(v) for k, v in data.get("routing", {}).items()})

    def applies(self, check: str, table: str) -> bool:
        return table in self.routing.get(check, ())

    def checks_for(self, table: str) -> list[str]:
        return sorted(c for c, tables in self.routing.items() if table in tables)
