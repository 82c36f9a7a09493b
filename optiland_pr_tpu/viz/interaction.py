"""Hover interactivity for the 2-D viewer (reference
visualization/system/ InteractionManager, compact form).

Artists registered with a payload get a hover annotation showing surface or
ray details. Connects matplotlib's `motion_notify_event`; in headless
(Agg) sessions the hooks are inert but harmless.
"""
from __future__ import annotations

__all__ = ["InteractionManager"]


class InteractionManager:
    def __init__(self, fig, ax, theme=None):
        self.fig = fig
        self.ax = ax
        self._payloads = {}
        from .themes import get_theme
        t = theme or get_theme()
        self.annotation = ax.annotate(
            "", xy=(0, 0), xytext=(12, 12), textcoords="offset points",
            bbox=dict(boxstyle="round,pad=0.4", fc=t.axes_face, ec=t.text,
                      alpha=0.9), color=t.text, fontsize=8, zorder=10)
        self.annotation.set_visible(False)
        self._cid = fig.canvas.mpl_connect("motion_notify_event",
                                           self._on_move)

    def register(self, artist, text: str):
        """Attach a hover payload to an artist (surface profile, ray path)."""
        artist.set_picker(3)
        self._payloads[artist] = text

    def _on_move(self, event):
        if event.inaxes != self.ax:
            return
        for artist, text in self._payloads.items():
            hit, _ = artist.contains(event)
            if hit:
                self.annotation.xy = (event.xdata, event.ydata)
                self.annotation.set_text(text)
                self.annotation.set_visible(True)
                self.fig.canvas.draw_idle()
                return
        if self.annotation.get_visible():
            self.annotation.set_visible(False)
            self.fig.canvas.draw_idle()

    def disconnect(self):
        self.fig.canvas.mpl_disconnect(self._cid)
