"""Native (C++) runtime components, built lazily with g++."""
