"""Native (C++) helpers loaded via ctypes.

Built artifacts live next to their sources; ``build.py`` (or the Makefile
rule inside each module) rebuilds them with g++. Missing artifacts degrade
gracefully to pure-Python fallbacks.
"""
