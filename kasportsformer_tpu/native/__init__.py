"""Native (C++) runtime components, bound via ctypes."""
