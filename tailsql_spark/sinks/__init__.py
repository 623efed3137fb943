"""Result sinks + output formatters (reference: sink/stdout.go, sink/format.go)."""
