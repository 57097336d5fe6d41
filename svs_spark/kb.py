"""KnowledgeBase façade (placeholder — implemented in Phase 1/2)."""


class KnowledgeBase:  # pragma: no cover - placeholder
    pass
