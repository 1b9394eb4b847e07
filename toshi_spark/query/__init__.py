"""Toshi-compatible JSON query DSL, compiler, and execution."""
