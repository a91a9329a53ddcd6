"""``ts`` namespace mirror — lets code written against the reference's
``ts.flint`` package import unchanged (``python/ts/__init__.py`` is a
namespace package there too)."""
