"""Plan inspection utilities (Catalyst physical-plan assertions)."""
