"""Native runtime bindings (ctypes) — see native/cnr_native.cpp."""
