"""Starst3r-TPU Blender add-on.

Capability parity with the reference add-on (reference: blender/__init__.py,
blender/interface.py, blender/importer.py) with one architectural change:
instead of running the network inside Blender's Python (which freezes the UI
for minutes — reference docs/blender.rst:7-24), reconstruction runs in a
subprocess via the `starst3r` CLI and the add-on imports the exported
points.ply + c2w/intrinsics. Blender stays responsive and needs no JAX in
its bundled interpreter.

Install: zip this directory and use Blender's "Install Add-on", or copy it
into the addons folder. Requires the `starst3r-tpu` package available to the
external Python given in the panel.
"""

bl_info = {
    "name": "Starst3r TPU",
    "author": "starst3r-tpu",
    "version": (0, 1, 0),
    "blender": (2, 80, 0),
    "location": "3D Viewport > Sidebar > Starst3r",
    "description": "Ultra fast 3D reconstruction (MASt3R-style + 3DGS) "
                   "via the starst3r CLI",
    "category": "Import-Export",
}

try:
    import bpy  # noqa: F401
    _HAVE_BPY = True
except Exception:  # pragma: no cover - outside Blender
    _HAVE_BPY = False

if _HAVE_BPY:
    from . import interface

    def register():
        interface.register()

    def unregister():
        interface.unregister()
else:  # importable for tests/linting outside Blender
    def register():  # pragma: no cover
        raise RuntimeError("bpy not available")

    def unregister():  # pragma: no cover
        raise RuntimeError("bpy not available")
