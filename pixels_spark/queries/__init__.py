"""Declared query registry — see registry.py."""

from .registry import REGISTRY, DeclaredQuery, declare, load_all_modules

__all__ = ["REGISTRY", "DeclaredQuery", "declare", "load_all_modules"]
