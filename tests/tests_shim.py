# no-op import shim used by tests
