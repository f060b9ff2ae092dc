package graft.mlx

import java.io.{DataInputStream, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Minimal pure-JVM Python pickle reader — enough of the protocol-2..5
  * opcode set to load numpy arrays and attribute-pickled scikit-learn
  * estimators, replacing the reference's embedded-Python model loader
  * (`ml/src/lib.rs:160-226` runs `pickle.load` through pyo3; we parse the
  * same byte stream natively so inference can be broadcast to executors
  * with no Python runtime on the cluster).
  *
  * Deliberately NOT a general unpickler: no class instantiation or code
  * execution ever happens. GLOBAL/STACK_GLOBAL push symbolic references;
  * REDUCE/NEWOBJ/BUILD materialize plain data records ([[Py.Obj]]) plus
  * special-cased numpy constructors (`_reconstruct`, `dtype`, `scalar`).
  * Unknown constructors become inert [[Py.Obj]] values — never callables —
  * so a malicious pickle can at worst produce garbage data, not effects.
  */
object Py {
  sealed trait V
  case object None extends V
  final case class Bool(b: Boolean) extends V
  final case class Num(v: Long) extends V
  final case class Flt(v: Double) extends V
  final case class Str(s: String) extends V
  final case class Bytes(b: Array[Byte]) extends V
  final case class Lst(items: mutable.ArrayBuffer[V]) extends V
  final case class Tup(items: Vector[V]) extends V
  final case class Dict(m: mutable.LinkedHashMap[V, V]) extends V
  /** Symbolic `module.name` reference (GLOBAL / STACK_GLOBAL). */
  final case class Global(module: String, name: String) extends V
  /** A reconstructed instance: class reference + ctor args + BUILD state.
    * For attribute-pickled objects (all sklearn estimators) `state` is the
    * instance `__dict__`. */
  final case class Obj(cls: Global, var args: V = None, var state: V = None) extends V
  /** numpy ndarray: flat buffer + shape + dtype. Object-dtype arrays keep
    * their elements in `objs` instead of `data`. */
  final case class NdArray(var shape: Vector[Int] = Vector.empty,
      var dtype: Dtype = Dtype.f8, var data: Array[Byte] = Array.empty,
      var objs: Vector[V] = Vector.empty) extends V {
    def n: Int = if (shape.isEmpty) 1 else shape.product
    /** element as double, for simple numeric dtypes */
    def d(i: Int): Double = dtype.readD(data, i * dtype.itemSize)
    def l(i: Int): Long = dtype.readL(data, i * dtype.itemSize)
    def toDoubles: Array[Double] = Array.tabulate(n)(d)
    def toLongs: Array[Long] = Array.tabulate(n)(l)
    /** fixed-width string element ('U' = UTF-32, 'S' = bytes), nulls
      * stripped — how numpy stores sklearn's string classes_. */
    def stringAt(i: Int): String = {
      val off = i * dtype.itemSize
      dtype.kind match {
        case 'U' =>
          val cs = (0 until dtype.itemSize / 4).map { j =>
            val bb = ByteBuffer.wrap(data, off + j * 4, 4)
            bb.order(if (dtype.little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
            bb.getInt
          }.takeWhile(_ != 0)
          new String(cs.flatMap(Character.toChars(_)).toArray)
        case 'S' =>
          new String(data.slice(off, off + dtype.itemSize).takeWhile(_ != 0), "ISO-8859-1")
        case k => throw new IllegalArgumentException(s"dtype kind $k not a string")
      }
    }

    /** structured-record field accessor: value of `field` in record `rec` */
    def field(name: String, rec: Int): Double = {
      val (fd, off) = dtype.fields(name)
      fd.readD(data, rec * dtype.itemSize + off)
    }
    def fieldL(name: String, rec: Int): Long = {
      val (fd, off) = dtype.fields(name)
      fd.readL(data, rec * dtype.itemSize + off)
    }
  }

  /** numpy dtype: scalar kind+size, or structured (names+fields). */
  final case class Dtype(kind: Char, var itemSize: Int,
      var little: Boolean = true,
      var names: Vector[String] = Vector.empty,
      var fields: Map[String, (Dtype, Int)] = Map.empty) {
    private def buf(b: Array[Byte], off: Int) = {
      val bb = ByteBuffer.wrap(b, off, itemSize)
      bb.order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    }
    def readD(b: Array[Byte], off: Int): Double = kind match {
      case 'f' => if (itemSize == 8) buf(b, off).getDouble else buf(b, off).getFloat.toDouble
      case 'i' | 'u' | 'b' => readL(b, off).toDouble
      case k => throw new IllegalArgumentException(s"dtype kind $k not numeric")
    }
    def readL(b: Array[Byte], off: Int): Long = kind match {
      case 'i' => itemSize match {
        case 8 => buf(b, off).getLong
        case 4 => buf(b, off).getInt.toLong
        case 2 => buf(b, off).getShort.toLong
        case 1 => b(off).toLong
      }
      case 'u' => itemSize match {
        case 8 => buf(b, off).getLong
        case 4 => buf(b, off).getInt.toLong & 0xffffffffL
        case 2 => buf(b, off).getShort.toLong & 0xffffL
        case 1 => b(off).toLong & 0xffL
      }
      case 'b' => b(off).toLong
      case 'f' => readD(b, off).toLong
      case k => throw new IllegalArgumentException(s"dtype kind $k not integral")
    }
  }
  object Dtype {
    val f8: Dtype = Dtype('f', 8)
    /** parse a descr string like '<f8', '|b1', 'i4', 'V56', 'O' */
    def parse(descr: String): Dtype = {
      var s = descr
      var little = true
      if (s.nonEmpty && "<>|=".contains(s.head)) { little = s.head != '>'; s = s.tail }
      val kind = s.head
      val size = if (s.length > 1) s.tail.toInt else (if (kind == 'O') 8 else 1)
      Dtype(kind, size, little)
    }
  }

  // ---- helpers over the parsed graph ----
  def str(v: V): String = v match { case Str(s) => s; case x => throw new IllegalArgumentException(s"not a str: $x") }
  def dict(v: V): mutable.LinkedHashMap[V, V] = v match { case Dict(m) => m; case x => throw new IllegalArgumentException(s"not a dict: $x") }
  def arr(v: V): NdArray = v match { case a: NdArray => a; case x => throw new IllegalArgumentException(s"not an ndarray: $x") }
  /** state-dict attribute lookup on an Obj */
  def attr(o: Obj, name: String): Option[V] = o.state match {
    case Dict(m) => m.get(Str(name))
    case _ => scala.None
  }
  def attrOrFail(o: Obj, name: String): V =
    attr(o, name).getOrElse(throw new IllegalArgumentException(
      s"${o.cls.module}.${o.cls.name} has no attribute '$name'"))
  /** numeric scalar from Flt/Num/0-d array/1-element array */
  def toD(v: V): Double = v match {
    case Flt(d) => d
    case Num(l) => l.toDouble
    case a: NdArray => a.d(0)
    case x => throw new IllegalArgumentException(s"not numeric: $x")
  }
}

object Pickle {
  import Py._

  /** Parse one pickled object from the stream. */
  def load(in: InputStream): V = new Machine(new DataInputStream(in)).run()

  def loadResource(path: String): V = {
    val s = getClass.getResourceAsStream(path)
    require(s != null, s"pickle resource $path not found on classpath")
    try load(s) finally s.close()
  }

  private final class Machine(in: DataInputStream) {
    private val stack = mutable.ArrayBuffer.empty[V]
    private val marks = mutable.ArrayBuffer.empty[Int]
    private val memo = mutable.ArrayBuffer.empty[V]

    private def push(v: V): Unit = stack += v
    private def pop(): V = { val v = stack.last; stack.trimEnd(1); v }
    private def popToMark(): Vector[V] = {
      val m = marks.last; marks.trimEnd(1)
      val items = stack.slice(m, stack.length).toVector
      stack.remove(m, stack.length - m)
      items
    }

    private def u1(): Int = in.readUnsignedByte()
    private def u2(): Int = { val a = u1(); val b = u1(); a | (b << 8) }
    private def i4(): Int = { val a = u1(); val b = u1(); val c = u1(); val d = u1(); a | (b << 8) | (c << 16) | (d << 24) }
    private def u8(): Long = {
      var v = 0L
      for (i <- 0 until 8) v |= (u1().toLong << (8 * i))
      v
    }
    private def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); in.readFully(b); b }
    private def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\n' && c >= 0) { sb.append(c.toChar); c = in.read() }
      sb.toString
    }

    /** REDUCE / NEWOBJ dispatch: build data records, special-casing numpy. */
    private def construct(callable: V, args: V): V = callable match {
      case g @ Global(m, n) =>
        (m.replace("numpy._core", "numpy.core"), n) match {
          case ("numpy.core.multiarray", "_reconstruct") => NdArray()
          case ("numpy", "dtype") | ("numpy.core.multiarray", "dtype") =>
            args match {
              case Tup(Str(descr) +: _) => DtypeBox(Dtype.parse(descr), Obj(g, args))
              case _ => Obj(g, args)
            }
          case ("numpy.core.numeric", "_frombuffer") =>
            // protocol-5 ndarray path (numpy >= 1.17)
            args match {
              case Tup(Vector(Bytes(b), db, Tup(shape), Str(order))) =>
                require(order != "F" || shape.length <= 1, "Fortran-order arrays unsupported")
                val a = NdArray()
                a.data = b
                a.dtype = unbox(db)
                a.shape = shape.map { case Num(l) => l.toInt; case x => throw new IllegalArgumentException(s"$x") }
                a
              case _ => Obj(g, args)
            }
          case ("numpy.core.multiarray", "scalar") =>
            args match {
              case Tup(Vector(db: V, Bytes(b))) =>
                val dt = unbox(db)
                if (dt.kind == 'f') Flt(dt.readD(b, 0)) else Num(dt.readL(b, 0))
              case _ => Obj(g, args)
            }
          case ("numpy.random._pickle" | "numpy.random", _) => Obj(g, args)
          case ("_codecs", "encode") => args match {
            // protocol<=2 ndarray payloads: latin-1 str → original bytes
            case Tup(Vector(Str(s), Str("latin1"))) => Bytes(s.getBytes("ISO-8859-1"))
            case _ => Obj(g, args)
          }
          case ("copyreg", "_reconstructor") => args match {
            case Tup(Vector(cls: Global, _, _)) => Obj(cls)
            case _ => Obj(g, args)
          }
          case ("builtins", "bytearray") => args match {
            case Tup(Vector(Bytes(b))) => Bytes(b)
            case _ => Bytes(Array.empty)
          }
          case _ => Obj(g, args)
        }
      case o: Obj => Obj(o.cls, args) // calling an instance — keep symbolic
      case other => throw new IllegalArgumentException(s"cannot construct from $other")
    }

    /** numpy dtype objects carried on the stack: the parsed Dtype plus the
      * Obj shell that BUILD will fill with the structured-field state. */
    private final case class DtypeBox(dt: Dtype, shell: Obj) extends V
    private def unbox(v: V): Dtype = v match {
      case DtypeBox(dt, _) => dt
      case _ => throw new IllegalArgumentException(s"expected dtype, got $v")
    }

    /** BUILD: apply `state` to the object on top of the stack. */
    private def build(target: V, state: V): V = target match {
      case a: NdArray =>
        // ndarray.__setstate__ = (version, shape, dtype, isFortran, data)
        state match {
          case Tup(Vector(_, Tup(shape), db, Bool(fortran), payload)) =>
            a.shape = shape.map { case Num(l) => l.toInt; case x => throw new IllegalArgumentException(s"$x") }
            a.dtype = unbox(db)
            require(!fortran || a.shape.length <= 1, "Fortran-order arrays unsupported")
            payload match {
              case Bytes(b) => a.data = b
              case Str(s) => a.data = s.getBytes("ISO-8859-1")
              case Lst(items) => a.objs = items.toVector // object-dtype
              case x => throw new IllegalArgumentException(s"ndarray payload $x")
            }
            a
          case _ => a
        }
      case DtypeBox(dt, shell) =>
        // dtype.__setstate__ = (ver, byteorder, subdescr, names, fields, elsize, align, flags)
        state match {
          case Tup(v) if v.length >= 5 =>
            v(1) match { case Str(bo) => dt.little = bo != ">"; case _ => () }
            (v(3), v(4)) match {
              case (Tup(names), Dict(fields)) =>
                dt.names = names.map(str)
                dt.fields = dt.names.map { nm =>
                  fields(Str(nm)) match {
                    case Tup(Vector(fdb, Num(off), _*)) => nm -> ((unbox(fdb), off.toInt))
                    case x => throw new IllegalArgumentException(s"dtype field $x")
                  }
                }.toMap
              case _ => ()
            }
            v(5) match { case Num(es) if es > 0 => dt.itemSize = es.toInt; case _ => () }
            shell.state = state
            DtypeBox(dt, shell)
          case _ => DtypeBox(dt, shell)
        }
      case o: Obj => o.state = state; o
      case other => throw new IllegalArgumentException(s"BUILD on $other")
    }

    def run(): V = {
      while (true) {
        val op = u1()
        op match {
          case 0x80 => u1() // PROTO
          case 0x95 => u8() // FRAME
          case '.' => return pop() // STOP
          case '(' => marks += stack.length // MARK
          case 'N' => push(None)
          case 0x88 => push(Bool(true)) // NEWTRUE
          case 0x89 => push(Bool(false)) // NEWFALSE
          case 'J' => push(Num(i4())) // BININT
          case 'K' => push(Num(u1())) // BININT1
          case 'M' => push(Num(u2())) // BININT2
          case 0x8a => // LONG1
            val n = u1(); val b = bytes(n)
            var v = BigInt(0)
            for (i <- (n - 1) to 0 by -1) v = (v << 8) | (b(i) & 0xff)
            if (n > 0 && (b(n - 1) & 0x80) != 0) v -= BigInt(1) << (8 * n)
            push(Num(v.toLong))
          case 'L' => // LONG (text)
            val s = line().stripSuffix("L"); push(Num(if (s.isEmpty) 0L else s.toLong))
          case 'I' => push(Num(line().toLong)) // INT (text)
          case 'F' => push(Flt(line().toDouble))
          case 'G' => // BINFLOAT (big-endian)
            push(Flt(java.lang.Double.longBitsToDouble(
              ByteBuffer.wrap(bytes(8)).order(ByteOrder.BIG_ENDIAN).getLong)))
          case 0x8c => push(Str(new String(bytes(u1()), "UTF-8"))) // SHORT_BINUNICODE
          case 'X' => push(Str(new String(bytes(i4()), "UTF-8"))) // BINUNICODE
          case 0x8d => push(Str(new String(bytes(u8().toInt), "UTF-8"))) // BINUNICODE8
          case 'U' => push(Bytes(bytes(u1()))) // SHORT_BINSTRING (latin1 bytes)
          case 'T' => push(Bytes(bytes(i4()))) // BINSTRING
          case 'C' => push(Bytes(bytes(u1()))) // SHORT_BINBYTES
          case 'B' => push(Bytes(bytes(i4()))) // BINBYTES
          case 0x8e => push(Bytes(bytes(u8().toInt))) // BINBYTES8
          case 0x96 => push(Bytes(bytes(u8().toInt))) // BYTEARRAY8
          case ']' => push(Lst(mutable.ArrayBuffer.empty)) // EMPTY_LIST
          case ')' => push(Tup(Vector.empty)) // EMPTY_TUPLE
          case '}' => push(Dict(mutable.LinkedHashMap.empty)) // EMPTY_DICT
          case 0x8f => push(Lst(mutable.ArrayBuffer.empty)) // EMPTY_SET (set≈list here)
          case 0x85 => push(Tup(Vector(pop()))) // TUPLE1
          case 0x86 => { val b = pop(); val a = pop(); push(Tup(Vector(a, b))) } // TUPLE2
          case 0x87 => { val c = pop(); val b = pop(); val a = pop(); push(Tup(Vector(a, b, c))) } // TUPLE3
          case 't' => push(Tup(popToMark())) // TUPLE
          case 'l' => push(Lst(mutable.ArrayBuffer(popToMark(): _*))) // LIST
          case 'a' => { val v = pop(); stack.last match { case Lst(it) => it += v; case x => throw new IllegalStateException(s"APPEND on $x") } }
          case 'e' => { val items = popToMark(); stack.last match { case Lst(it) => it ++= items; case x => throw new IllegalStateException(s"APPENDS on $x") } }
          case 0x90 => { val items = popToMark(); stack.last match { case Lst(it) => it ++= items; case x => throw new IllegalStateException(s"ADDITEMS on $x") } }
          case 's' => { val v = pop(); val k = pop(); stack.last match { case Dict(m) => m(k) = v; case x => throw new IllegalStateException(s"SETITEM on $x") } }
          case 'u' => // SETITEMS
            val items = popToMark()
            stack.last match {
              case Dict(m) => items.grouped(2).foreach { case Vector(k, v) => m(k) = v; case _ => () }
              case x => throw new IllegalStateException(s"SETITEMS on $x")
            }
          case 'c' => { val mod = line(); val nm = line(); push(Global(mod, nm)) } // GLOBAL
          case 0x93 => { val nm = pop(); val mod = pop(); push(Global(str(mod), str(nm))) } // STACK_GLOBAL
          case 'R' => { val args = pop(); val f = pop(); push(construct(f, args)) } // REDUCE
          case 0x81 => { val args = pop(); val cls = pop(); push(construct(cls, args)) } // NEWOBJ
          case 0x92 => { val kw = pop(); val args = pop(); val cls = pop(); val o = construct(cls, args); val _ = kw; push(o) } // NEWOBJ_EX
          case 'b' => { val state = pop(); val target = pop(); push(build(target, state)) } // BUILD
          case 0x94 => memo += stack.last // MEMOIZE
          case 'q' => { val i = u1(); while (memo.length <= i) memo += None; memo(i) = stack.last } // BINPUT
          case 'r' => { val i = i4(); while (memo.length <= i) memo += None; memo(i) = stack.last } // LONG_BINPUT
          case 'h' => push(memo(u1())) // BINGET
          case 'j' => push(memo(i4())) // LONG_BINGET
          case 'p' => { val i = line().toInt; while (memo.length <= i) memo += None; memo(i) = stack.last } // PUT
          case 'g' => push(memo(line().toInt)) // GET
          case '0' => pop() // POP
          case '1' => popToMark() // POP_MARK
          case '2' => push(stack.last) // DUP
          case 0x83 => // EXT2: copyreg extension registry — consuming the
            // code without pushing silently corrupts the stack; fail loud
            throw new IllegalArgumentException(
              s"unsupported pickle opcode EXT2 (copyreg extension ${u2()})")
          case other => throw new IllegalArgumentException(
            f"unsupported pickle opcode 0x$other%02x ('${other.toChar}') at stack depth ${stack.length}")
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
}
