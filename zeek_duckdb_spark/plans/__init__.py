"""Plan inspection / audit helpers (pushdown + broadcast checks)."""
