package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

import org.scalatest.TagAnnotation;

/**
 * Suite-level "slow" tag (r21): the streaming-maintainer / soak-ish
 * suites dominate `sbt test` wall time (the r20 driver run spent 18:52
 * in tests and its verify stage was then killed on the wall-clock
 * budget before emitting anything). Suites annotated with this are
 * EXCLUDED from a bare `sbt test` (see build.sbt) and run with
 * `SPARK_GRAFT_SLOW_TESTS=1 sbt test` — the full set stays green and is
 * exercised before every round close (OPTIMIZATION_r21.md records the
 * runs). The exclusion name doubles as the per-test ScalaTest tag
 * {@code graft.tags.SlowTag}.
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Slow {}
