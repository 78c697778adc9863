"""Utilities (reference ``pyamg/util``)."""
