"""Command-line entry points (reference-compatible -p/-m/-t triplet)."""
