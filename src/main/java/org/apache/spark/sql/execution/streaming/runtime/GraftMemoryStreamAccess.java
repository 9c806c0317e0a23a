package org.apache.spark.sql.execution.streaming.runtime;

import org.apache.spark.sql.catalyst.expressions.UnsafeRow;

/**
 * Bytecode-level accessor for {@link MemoryStreamBaseClass}'s
 * Scala-protected {@code batches} / {@code currentOffset} members (public
 * in bytecode; scalac alone enforces the protection). Used by
 * GraftParallelFeed to append a pre-encoded batch under the stream's
 * monitor with the exact protocol of {@code MemoryStream.addData}: one
 * offset bump per call, rows appended as one micro-batch. Same
 * package-shim technique as {@code org.apache.spark.graftshim}.
 */
public final class GraftMemoryStreamAccess {
    private GraftMemoryStreamAccess() {}

    public static void append(MemoryStreamBaseClass<?> ms, UnsafeRow[] rows) {
        synchronized (ms) {
            ms.currentOffset_$eq(ms.currentOffset().$plus(1L));
            ms.batches().addOne(rows);
        }
    }
}
