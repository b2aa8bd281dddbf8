"""Live external-system connectors (flag-gated: the backing services and
connector jars are absent from this container; each module exposes an
availability probe and injectable reader/writer seams that mock tests
exercise)."""
