"""sydraQL recursive-descent parser.

Grammar mirrors reference src/sydra/query/parser.zig:378-540 precedence:

    or < and < equality(= != =~ !~) < comparison(< <= > >= between)
       < additive(+ -) < multiplicative(* / %) < unary(- not +) < call < primary

Statements: SELECT (parser.zig:219-376), INSERT (parser.zig:152-199),
DELETE (parser.zig:201-217), EXPLAIN (parser.zig:76-84).
FILL clause: parser.zig:280-320.
"""

from __future__ import annotations

from sydradb_spark.errors import ParseError
from sydradb_spark.sydraql import ast
from sydradb_spark.sydraql.lexer import T, Token, tokenize


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # --- token helpers -------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind: T) -> bool:
        return self.toks[self.i].kind == kind

    def accept(self, kind: T) -> Token | None:
        if self.at(kind):
            return self.next()
        return None

    def expect(self, kind: T, what: str) -> Token:
        if not self.at(kind):
            t = self.peek()
            raise ParseError(f"expected {what}, got {t.text or 'end of input'!r}", pos=t.pos)
        return self.next()

    # --- statements ----------------------------------------------------
    def parse_statement(self) -> ast.Statement:
        if self.accept(T.EXPLAIN):
            return ast.Explain(self.parse_statement())
        if self.at(T.SELECT):
            return self.parse_select()
        if self.at(T.INSERT):
            return self.parse_insert()
        if self.at(T.DELETE):
            return self.parse_delete()
        t = self.peek()
        raise ParseError(f"expected statement, got {t.text!r}", pos=t.pos)

    def parse(self) -> ast.Statement:
        stmt = self.parse_statement()
        self.expect(T.EOF, "end of input")
        return stmt

    def parse_select(self) -> ast.Select:
        self.expect(T.SELECT, "SELECT")
        items = [self.parse_select_item()]
        while self.accept(T.COMMA):
            items.append(self.parse_select_item())
        sel = ast.Select(items=items)
        if self.accept(T.FROM):
            sel.selector = self.parse_selector()
        if self.accept(T.WHERE):
            sel.where = self.parse_expr()
        if self.accept(T.GROUP):
            self.expect(T.BY, "BY after GROUP")
            sel.group_by.append(self.parse_expr())
            while self.accept(T.COMMA):
                sel.group_by.append(self.parse_expr())
        if self.accept(T.FILL):
            sel.fill = self.parse_fill()
        if self.accept(T.ORDER):
            self.expect(T.BY, "BY after ORDER")
            sel.order_by.append(self.parse_order_item())
            while self.accept(T.COMMA):
                sel.order_by.append(self.parse_order_item())
        if self.accept(T.LIMIT):
            sel.limit = int(self.expect(T.INT, "integer LIMIT").value)
            if self.accept(T.OFFSET):
                sel.offset = int(self.expect(T.INT, "integer OFFSET").value)
        return sel

    def parse_select_item(self) -> ast.SelectItem:
        expr = self.parse_expr()
        alias = None
        if self.accept(T.AS):
            alias = str(self.expect(T.IDENT, "alias identifier").value)
        return ast.SelectItem(expr=expr, alias=alias)

    def parse_selector(self) -> ast.Selector:
        t = self.peek()
        if t.kind == T.IDENT and t.value and str(t.value).lower() == "by_id":
            self.next()
            self.expect(T.LPAREN, "'(' after by_id")
            neg = bool(self.accept(T.MINUS))
            sid = self.expect(T.INT, "series id integer")
            self.expect(T.RPAREN, "')'")
            return ast.Selector(kind="by_id", series_id=-int(sid.value) if neg else int(sid.value))
        # dotted series name: ns.metric[.more], optional tag qualifiers
        # `{k='v', ...}` (Prometheus-style; activates the name+tags selector
        # the reference registry implies but never parses — SURVEY §2.1)
        parts = [str(self.expect(T.IDENT, "series name").value)]
        while self.accept(T.DOT):
            parts.append(str(self.expect(T.IDENT, "series name segment").value))
        tags = None
        if self.accept(T.LBRACE):
            tags = {}
            if not self.at(T.RBRACE):
                while True:
                    key = str(self.expect(T.IDENT, "tag key").value)
                    self.expect(T.EQ, "'=' in tag qualifier")
                    val = self.expect(T.STRING, "tag value string")
                    tags[key] = str(val.value)
                    if not self.accept(T.COMMA):
                        break
            self.expect(T.RBRACE, "'}' after tag qualifiers")
        return ast.Selector(kind="name", name=".".join(parts), tags=tags)

    def parse_fill(self) -> ast.Fill:
        self.expect(T.LPAREN, "'(' after FILL")
        t = self.peek()
        if t.kind == T.IDENT and str(t.value).lower() in ("previous", "linear"):
            self.next()
            fill = ast.Fill(kind=str(t.value).lower())
        elif t.kind == T.NULL:
            self.next()
            fill = ast.Fill(kind="null")
        else:
            fill = ast.Fill(kind="constant", constant=self.parse_expr())
        self.expect(T.RPAREN, "')' after FILL argument")
        return fill

    def parse_order_item(self) -> ast.OrderItem:
        expr = self.parse_expr()
        desc = False
        if self.accept(T.DESC):
            desc = True
        else:
            self.accept(T.ASC)
        return ast.OrderItem(expr=expr, descending=desc)

    def parse_insert(self) -> ast.Insert:
        self.expect(T.INSERT, "INSERT")
        self.expect(T.INTO, "INTO")
        parts = [str(self.expect(T.IDENT, "table name").value)]
        while self.accept(T.DOT):
            parts.append(str(self.expect(T.IDENT, "table name segment").value))
        columns: list[str] = []
        if self.accept(T.LPAREN):
            columns.append(str(self.expect(T.IDENT, "column name").value))
            while self.accept(T.COMMA):
                columns.append(str(self.expect(T.IDENT, "column name").value))
            self.expect(T.RPAREN, "')'")
        self.expect(T.VALUES, "VALUES")
        rows = [self.parse_value_tuple()]
        while self.accept(T.COMMA):
            rows.append(self.parse_value_tuple())
        return ast.Insert(target=".".join(parts), columns=columns, rows=rows)

    def parse_value_tuple(self) -> list[ast.Expr]:
        self.expect(T.LPAREN, "'('")
        exprs = [self.parse_expr()]
        while self.accept(T.COMMA):
            exprs.append(self.parse_expr())
        self.expect(T.RPAREN, "')'")
        return exprs

    def parse_delete(self) -> ast.Delete:
        self.expect(T.DELETE, "DELETE")
        self.expect(T.FROM, "FROM")
        target = self.parse_selector()
        where = None
        if self.accept(T.WHERE):
            where = self.parse_expr()
        return ast.Delete(target=target, where=where)

    # --- expressions -----------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        return self.parse_or()

    def parse_or(self) -> ast.Expr:
        left = self.parse_and()
        while self.at(T.OR):
            pos = self.next().pos
            left = ast.Binary(op=ast.BinOp.OR, left=left, right=self.parse_and(), pos=pos)
        return left

    def parse_and(self) -> ast.Expr:
        left = self.parse_equality()
        while self.at(T.AND):
            pos = self.next().pos
            left = ast.Binary(op=ast.BinOp.AND, left=left, right=self.parse_equality(), pos=pos)
        return left

    _EQ_OPS = {
        T.EQ: ast.BinOp.EQ,
        T.NEQ: ast.BinOp.NEQ,
        T.REGEX_MATCH: ast.BinOp.REGEX_MATCH,
        T.REGEX_NOT_MATCH: ast.BinOp.REGEX_NOT_MATCH,
    }

    def parse_equality(self) -> ast.Expr:
        left = self.parse_comparison()
        while self.peek().kind in self._EQ_OPS:
            t = self.next()
            left = ast.Binary(
                op=self._EQ_OPS[t.kind], left=left, right=self.parse_comparison(), pos=t.pos
            )
        return left

    _CMP_OPS = {T.LT: ast.BinOp.LT, T.LTE: ast.BinOp.LTE, T.GT: ast.BinOp.GT, T.GTE: ast.BinOp.GTE}

    def parse_comparison(self) -> ast.Expr:
        left = self.parse_additive()
        if self.at(T.BETWEEN):
            # sugar: x BETWEEN a AND b  →  x >= a and x <= b
            pos = self.next().pos
            lo = self.parse_additive()
            self.expect(T.AND, "AND in BETWEEN")
            hi = self.parse_additive()
            return ast.Binary(
                op=ast.BinOp.AND,
                left=ast.Binary(op=ast.BinOp.GTE, left=left, right=lo, pos=pos),
                right=ast.Binary(op=ast.BinOp.LTE, left=left, right=hi, pos=pos),
                pos=pos,
            )
        while self.peek().kind in self._CMP_OPS:
            t = self.next()
            left = ast.Binary(
                op=self._CMP_OPS[t.kind], left=left, right=self.parse_additive(), pos=t.pos
            )
        return left

    def parse_additive(self) -> ast.Expr:
        left = self.parse_multiplicative()
        while self.peek().kind in (T.PLUS, T.MINUS):
            t = self.next()
            op = ast.BinOp.ADD if t.kind == T.PLUS else ast.BinOp.SUB
            left = ast.Binary(op=op, left=left, right=self.parse_multiplicative(), pos=t.pos)
        return left

    _MUL_OPS = {T.STAR: ast.BinOp.MUL, T.SLASH: ast.BinOp.DIV, T.PERCENT: ast.BinOp.MOD}

    def parse_multiplicative(self) -> ast.Expr:
        left = self.parse_unary()
        while self.peek().kind in self._MUL_OPS:
            t = self.next()
            left = ast.Binary(op=self._MUL_OPS[t.kind], left=left, right=self.parse_unary(), pos=t.pos)
        return left

    def parse_unary(self) -> ast.Expr:
        t = self.peek()
        if t.kind == T.MINUS:
            self.next()
            return ast.Unary(op=ast.UnOp.NEG, operand=self.parse_unary(), pos=t.pos)
        if t.kind == T.PLUS:
            self.next()
            return ast.Unary(op=ast.UnOp.POS, operand=self.parse_unary(), pos=t.pos)
        if t.kind == T.NOT:
            self.next()
            return ast.Unary(op=ast.UnOp.NOT, operand=self.parse_unary(), pos=t.pos)
        return self.parse_primary()

    def parse_primary(self) -> ast.Expr:
        t = self.next()
        if t.kind == T.INT:
            return ast.Literal(kind="int", value=t.value, pos=t.pos)
        if t.kind == T.FLOAT:
            return ast.Literal(kind="float", value=t.value, pos=t.pos)
        if t.kind == T.STRING:
            return ast.Literal(kind="string", value=t.value, pos=t.pos)
        if t.kind == T.DURATION:
            return ast.Literal(kind="duration", value=t.value, pos=t.pos)
        if t.kind == T.TIMESTAMP:
            return ast.Literal(kind="timestamp", value=t.value, pos=t.pos)
        if t.kind == T.TRUE:
            return ast.Literal(kind="bool", value=True, pos=t.pos)
        if t.kind == T.FALSE:
            return ast.Literal(kind="bool", value=False, pos=t.pos)
        if t.kind == T.NULL:
            return ast.Literal(kind="null", value=None, pos=t.pos)
        if t.kind == T.LPAREN:
            inner = self.parse_expr()
            self.expect(T.RPAREN, "')'")
            return inner
        if t.kind == T.IDENT:
            name = str(t.value)
            if self.at(T.LPAREN):  # function call
                self.next()
                args: list[ast.Expr] = []
                if not self.at(T.RPAREN):
                    args.append(self.parse_expr())
                    while self.accept(T.COMMA):
                        args.append(self.parse_expr())
                self.expect(T.RPAREN, "')' after call args")
                return ast.Call(func=name.lower(), args=args, pos=t.pos)
            if name.lower() == "tag" and self.at(T.DOT):
                # tag.<key> — key keeps its case (reference resolves the
                # trailing segment, expression.zig:25-156)
                self.next()
                key = str(self.expect(T.IDENT, "tag key").value)
                return ast.Identifier(name=f"tag.{key}", pos=t.pos)
            return ast.Identifier(name=name.lower(), pos=t.pos)
        raise ParseError(f"unexpected token {t.text!r}", pos=t.pos)


def parse(src: str) -> ast.Statement:
    return Parser(tokenize(src)).parse()
