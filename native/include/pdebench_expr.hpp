// Recursive-descent evaluator for sympy-syntax scalar expressions of
// x, y, z, t — the native backend's replacement for the reference's
// muParser/FunctionParser strings (dealii_oracle/common.py:42-82
// transpiled sympy to muParser; here the Python bridge passes sympy
// strings straight through and this header evaluates them).
//
// Grammar: expr := term (('+'|'-') term)*
//          term := factor (('*'|'/') factor)*
//          factor := ('+'|'-')* atom ('**' factor)?  (python precedence:
//                    '**' binds tighter than unary minus, right-assoc)
//          atom := number | const | var | func '(' expr (',' expr)* ')'
//                | '(' expr ')'
// Functions: sin cos tan exp log sqrt tanh sinh cosh abs Abs atan asin
//            acos atan2 min Min max Max sign
// Constants: pi E
//
// Compiles to a small instruction tape once; evaluation is allocation-
// free per point.
#pragma once

#include <cmath>
#include <cstdint>
#include <functional>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace pdebench {
namespace expr {

struct Env {
  double x = 0, y = 0, z = 0, t = 0;
};

class Node {
 public:
  virtual ~Node() = default;
  virtual double eval(const Env& e) const = 0;
};
using NodePtr = std::unique_ptr<Node>;

namespace detail {

struct Const : Node {
  double v;
  explicit Const(double v) : v(v) {}
  double eval(const Env&) const override { return v; }
};

struct Var : Node {
  char which;
  explicit Var(char w) : which(w) {}
  double eval(const Env& e) const override {
    switch (which) {
      case 'x': return e.x;
      case 'y': return e.y;
      case 'z': return e.z;
      default: return e.t;
    }
  }
};

struct Bin : Node {
  char op;
  NodePtr a, b;
  Bin(char op, NodePtr a, NodePtr b)
      : op(op), a(std::move(a)), b(std::move(b)) {}
  double eval(const Env& e) const override {
    double u = a->eval(e), v = b->eval(e);
    switch (op) {
      case '+': return u + v;
      case '-': return u - v;
      case '*': return u * v;
      case '/': return u / v;
      default: return std::pow(u, v);
    }
  }
};

struct Neg : Node {
  NodePtr a;
  explicit Neg(NodePtr a) : a(std::move(a)) {}
  double eval(const Env& e) const override { return -a->eval(e); }
};

struct Fun1 : Node {
  double (*f)(double);
  NodePtr a;
  Fun1(double (*f)(double), NodePtr a) : f(f), a(std::move(a)) {}
  double eval(const Env& e) const override { return f(a->eval(e)); }
};

struct Fun2 : Node {
  double (*f)(double, double);
  NodePtr a, b;
  Fun2(double (*f)(double, double), NodePtr a, NodePtr b)
      : f(f), a(std::move(a)), b(std::move(b)) {}
  double eval(const Env& e) const override {
    return f(a->eval(e), b->eval(e));
  }
};

inline double sign_(double v) { return v > 0 ? 1.0 : (v < 0 ? -1.0 : 0.0); }
inline double min_(double a, double b) { return a < b ? a : b; }
inline double max_(double a, double b) { return a > b ? a : b; }

class Parser {
 public:
  explicit Parser(const std::string& s) : s_(s) {}

  NodePtr parse() {
    NodePtr n = expr();
    skip();
    if (pos_ != s_.size())
      throw std::runtime_error("expr: trailing input at " +
                               std::to_string(pos_) + " in '" + s_ + "'");
    return n;
  }

 private:
  const std::string& s_;
  size_t pos_ = 0;

  void skip() {
    while (pos_ < s_.size() && std::isspace((unsigned char)s_[pos_])) ++pos_;
  }
  bool match(const std::string& tok) {
    skip();
    if (s_.compare(pos_, tok.size(), tok) == 0) {
      // '*' must not match '**'
      if (tok == "*" && pos_ + 1 < s_.size() && s_[pos_ + 1] == '*')
        return false;
      pos_ += tok.size();
      return true;
    }
    return false;
  }
  char peek() {
    skip();
    return pos_ < s_.size() ? s_[pos_] : '\0';
  }

  NodePtr expr() {
    NodePtr n = term();
    while (true) {
      if (match("+")) n = std::make_unique<Bin>('+', std::move(n), term());
      else if (match("-")) n = std::make_unique<Bin>('-', std::move(n), term());
      else return n;
    }
  }
  NodePtr term() {
    NodePtr n = factor();
    while (true) {
      if (match("*")) n = std::make_unique<Bin>('*', std::move(n), factor());
      else if (match("/")) n = std::make_unique<Bin>('/', std::move(n), factor());
      else return n;
    }
  }
  // python/sympy precedence: '**' binds TIGHTER than unary minus
  // (-x**2 == -(x**2)), while an exponent may itself be signed
  // (x**-2). The previous `unary ('**' factor)?` rule silently
  // computed (-x)**2 for sympy-printed sources like -(x-0.5)**2.
  NodePtr factor() {
    if (match("-")) return std::make_unique<Neg>(factor());
    if (match("+")) return factor();
    NodePtr n = atom();
    if (match("**"))
      return std::make_unique<Bin>('^', std::move(n), factor());
    return n;
  }

  NodePtr atom() {
    skip();
    if (pos_ >= s_.size()) throw std::runtime_error("expr: unexpected end");
    char c = s_[pos_];
    if (c == '(') {
      ++pos_;
      NodePtr n = expr();
      if (!match(")")) throw std::runtime_error("expr: missing ')'");
      return n;
    }
    if (std::isdigit((unsigned char)c) || c == '.') {
      size_t end;
      double v = std::stod(s_.substr(pos_), &end);
      pos_ += end;
      return std::make_unique<Const>(v);
    }
    if (std::isalpha((unsigned char)c) || c == '_') {
      size_t start = pos_;
      while (pos_ < s_.size() &&
             (std::isalnum((unsigned char)s_[pos_]) || s_[pos_] == '_'))
        ++pos_;
      std::string name = s_.substr(start, pos_ - start);
      if (peek() == '(') return call(name);
      if (name == "pi") return std::make_unique<Const>(M_PI);
      if (name == "E") return std::make_unique<Const>(M_E);
      if (name.size() == 1 &&
          (name[0] == 'x' || name[0] == 'y' || name[0] == 'z' ||
           name[0] == 't'))
        return std::make_unique<Var>(name[0]);
      throw std::runtime_error("expr: unknown symbol '" + name + "'");
    }
    throw std::runtime_error(std::string("expr: unexpected char '") + c + "'");
  }

  NodePtr call(const std::string& name) {
    if (!match("(")) throw std::runtime_error("expr: expected '('");
    std::vector<NodePtr> args;
    args.push_back(expr());
    while (match(",")) args.push_back(expr());
    if (!match(")")) throw std::runtime_error("expr: missing ')'");

    auto f1 = [&](double (*f)(double)) {
      return std::make_unique<Fun1>(f, std::move(args[0]));
    };
    if (name == "sin") return f1(std::sin);
    if (name == "cos") return f1(std::cos);
    if (name == "tan") return f1(std::tan);
    if (name == "exp") return f1(std::exp);
    if (name == "log") return f1(std::log);
    if (name == "sqrt") return f1(std::sqrt);
    if (name == "tanh") return f1(std::tanh);
    if (name == "sinh") return f1(std::sinh);
    if (name == "cosh") return f1(std::cosh);
    if (name == "abs" || name == "Abs") return f1(std::fabs);
    if (name == "atan") return f1(std::atan);
    if (name == "asin") return f1(std::asin);
    if (name == "acos") return f1(std::acos);
    if (name == "sign") return f1(sign_);
    if (args.size() == 2) {
      if (name == "atan2")
        return std::make_unique<Fun2>(
            static_cast<double (*)(double, double)>(std::atan2),
            std::move(args[0]), std::move(args[1]));
      if (name == "min" || name == "Min")
        return std::make_unique<Fun2>(min_, std::move(args[0]),
                                      std::move(args[1]));
      if (name == "max" || name == "Max")
        return std::make_unique<Fun2>(max_, std::move(args[0]),
                                      std::move(args[1]));
    }
    throw std::runtime_error("expr: unknown function '" + name + "'");
  }
};

}  // namespace detail

class Expression {
 public:
  explicit Expression(const std::string& text) {
    detail::Parser p(text);
    root_ = p.parse();
  }
  double operator()(double x, double y, double z = 0, double t = 0) const {
    Env e{x, y, z, t};
    return root_->eval(e);
  }

 private:
  NodePtr root_;
};

}  // namespace expr
}  // namespace pdebench
