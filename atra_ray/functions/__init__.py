"""Pure, deterministic kernels. No Ray imports here — everything in this
package must be callable from a plain unit test, from the single-threaded
oracle simulator, and from inside ``map_batches`` workers alike."""
