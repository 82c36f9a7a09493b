"""Viewer theming (reference visualization/system/ themes, compact form).

A theme is a small style record consumed by the viewers; `set_theme`
switches the process-wide default ("light", "dark", "classic").
"""
from __future__ import annotations

import dataclasses

__all__ = ["Theme", "THEMES", "set_theme", "get_theme"]


@dataclasses.dataclass(frozen=True)
class Theme:
    name: str
    background: str
    axes_face: str
    text: str
    surface: str
    glass_fill: str
    glass_alpha: float
    mirror: str
    ray_cmap: str
    grid: bool


THEMES = {
    "light": Theme("light", "#ffffff", "#ffffff", "#202020", "#303030",
                   "#9ecbff", 0.35, "#8a8a8a", "viridis", False),
    "dark": Theme("dark", "#15181c", "#15181c", "#e8e8e8", "#d0d0d0",
                  "#3d6d9e", 0.45, "#b8b8b8", "plasma", False),
    "classic": Theme("classic", "#f4f1ea", "#f4f1ea", "#1a1a1a", "#000000",
                     "#cfe2f3", 0.5, "#777777", "tab10", True),
}

_current = THEMES["light"]


def set_theme(name: str) -> Theme:
    global _current
    if isinstance(name, Theme):
        _current = name
    else:
        _current = THEMES[name]
    return _current


def get_theme() -> Theme:
    return _current
