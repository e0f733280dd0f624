"""SURVEY.md §2 operator inventory, one module per family.

Modules self-register into ..registry on import (see registry._load_all).
"""
